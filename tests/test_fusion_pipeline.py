"""Tests for the flagship fusion/fitting model (models/fusion_pipeline.py)."""

import dataclasses

import pytest

import numpy as np
import jax.numpy as jnp

from voxelized_geometry_tools_tpu import GridSpec
from voxelized_geometry_tools_tpu.core import transforms
from voxelized_geometry_tools_tpu.ops import edt, render
from voxelized_geometry_tools_tpu.models import fusion_pipeline as fp


def make_scene(n=24):
    spec = GridSpec.from_voxel_counts(0.1, (n, n, n))
    xs, ys, zs = np.meshgrid(*[np.arange(n)] * 3, indexing="ij", sparse=True)
    filled = ((xs - n / 2) ** 2 + (ys - n / 2) ** 2
              + (zs - n / 2) ** 2) <= (n / 4) ** 2
    sdf = edt.extract_signed_distance_field(jnp.asarray(filled), spec, None)
    center = np.asarray(spec.grid_sizes) / 2.0
    cams = []
    for offset in ((0.0, 0.0, -3.0), (0.0, -3.0, 0.0)):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = center + np.asarray(offset, np.float32)
        if offset[1] != 0.0:  # look along +y: rotate optical axis
            pose[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]],
                                    np.float32).T
        cams.append(render.PinholeCamera.create(pose, 32, 24, focal=28.0))
    return sdf, cams


def test_se3_exp_identity_and_smoothness():
    m = fp.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(m), np.eye(4), atol=1e-6)
    import jax
    g = jax.jacobian(lambda t: fp.se3_exp(t))(jnp.zeros(6))
    assert bool(jnp.all(jnp.isfinite(g)))  # no NaN gradient at identity


def test_fit_voxels_reduces_loss():
    sdf, cams = make_scene()
    targets = [render.render_depth(sdf, c, num_steps=32).depth for c in cams]
    noise = 0.04 * np.random.default_rng(0).standard_normal(
        np.asarray(sdf.distances).shape).astype(np.float32)
    noisy = sdf.replace(distances=sdf.distances + noise)
    refined, losses = fp.fit_voxels(noisy, cams, targets, num_iters=25,
                                    num_steps=32)
    losses = np.asarray(losses)
    assert losses[-1] < 0.5 * losses[0]
    assert refined.locked


def test_fit_camera_pose_remat_matches():
    """remat=True reaches the fitters through **render_kwargs and fits to
    the same optimum. (Not bit-equal: XLA compiles the rematerialized
    backward as a different program, so reduction orders in the pose-
    tangent grad can differ at the last ulp.)"""
    sdf, cams = make_scene()
    target = render.render_depth(sdf, cams[0], num_steps=24).depth
    base = dataclasses.replace(
        cams[0], pose=fp.perturb_pose(cams[0].pose,
                                      jnp.asarray([0.02, 0, 0, 0, 0.01, 0])))
    fits = [fp.fit_camera_pose(sdf, base, target, num_iters=6,
                               num_steps=24, remat=rm)
            for rm in (False, True)]
    np.testing.assert_allclose(np.asarray(fits[0].losses),
                               np.asarray(fits[1].losses),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fits[0].tangent),
                               np.asarray(fits[1].tangent),
                               rtol=1e-4, atol=1e-7)
    assert float(fits[0].losses[-1]) < float(fits[0].losses[0])


def test_reconstruct_pipeline_runs():
    from voxelized_geometry_tools_tpu import OccupancyMap
    from voxelized_geometry_tools_tpu.ops import voxelize
    spec = GridSpec.from_voxel_counts(0.25, (8, 8, 8))
    origin = transforms.isometry_from_translation((-1.0, -1.0, -1.0))
    env = OccupancyMap.create(spec, origin, "w")
    pts = np.stack(np.meshgrid(np.linspace(-0.9, 0.9, 12),
                               np.linspace(-0.9, 0.9, 12),
                               indexing="ij"), -1)
    pts = np.concatenate([pts, np.full((12, 12, 1), 0.8)], -1).reshape(-1, 3)
    cloud = voxelize.PointCloud.create(pts.astype(np.float32), np.eye(4))
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (0.0, 0.0, -2.0)
    cam = render.PinholeCamera.create(pose, 16, 12, focal=14.0)
    out = fp.reconstruct(env, [cloud], cam, num_render_steps=24)
    assert out.sdf.locked
    assert out.render_result.depth.shape == (12, 16)


def test_fit_voxels_corner_table_gradient_is_live():
    """Passing corner_table to fit_voxels must still move the DATA term: a
    prebuilt table bakes the original distances (zero voxel gradient, the
    fit would silently minimize only the TV prior), so the fitter rebuilds
    the table from the current values inside each loss evaluation."""
    from voxelized_geometry_tools_tpu.ops import sdf_query
    sdf, cams = make_scene()
    targets = [render.render_depth(sdf, c, num_steps=32).depth for c in cams]
    noise = 0.04 * np.random.default_rng(1).standard_normal(
        np.asarray(sdf.distances).shape).astype(np.float32)
    noisy = sdf.replace(distances=sdf.distances + noise)
    table = sdf_query.build_corner_table(noisy)
    refined, losses = fp.fit_voxels(noisy, cams, targets, num_iters=25,
                                    num_steps=32, smoothness_weight=0.0,
                                    corner_table=table)
    losses = np.asarray(losses)
    # With ZERO smoothness weight, any loss decrease is the data term.
    assert losses[-1] < 0.5 * losses[0]
    assert not np.allclose(np.asarray(refined.distances),
                           np.asarray(noisy.distances))


def test_fit_voxels_rejects_mismatched_inputs():
    sdf, cams = make_scene()
    with pytest.raises(ValueError, match="at least one"):
        fp.fit_voxels(sdf, [], [], num_iters=1)
    with pytest.raises(ValueError, match="cameras"):
        fp.fit_voxels(sdf, cams, [jnp.zeros((2, 2))], num_iters=1)


def test_depth_loss_ignores_zero_depth_holes():
    """Sensor images encode missing returns as depth 0; those pixels must
    not contribute (they'd drag the fit toward the camera)."""
    sdf, cams = make_scene()
    target = np.asarray(render.render_depth(sdf, cams[0],
                                            num_steps=24).depth)
    l_ref = float(fp.depth_loss(sdf, cams[0], jnp.asarray(target),
                                num_steps=24))
    holes = target.copy()
    holes[::2, ::2] = 0.0  # punch missing-return holes
    l_holes = float(fp.depth_loss(sdf, cams[0], jnp.asarray(holes),
                                  num_steps=24))
    assert l_holes <= l_ref + 1e-6
