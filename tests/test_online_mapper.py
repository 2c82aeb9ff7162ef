"""Tests for the incremental online mapper (models/online_mapper.py)."""

import numpy as np
import jax.numpy as jnp

from voxelized_geometry_tools_tpu import GridSpec
from voxelized_geometry_tools_tpu.core import transforms
from voxelized_geometry_tools_tpu.models.online_mapper import OnlineMapper
from voxelized_geometry_tools_tpu.ops import render, voxelize


def _plane_cloud(z, n=10, extent=0.9):
    g = np.linspace(-extent, extent, n)
    pts = np.stack(np.meshgrid(g, g, indexing="ij"), -1)
    pts = np.concatenate([pts, np.full((n, n, 1), z)], -1).reshape(-1, 3)
    return pts.astype(np.float32)


def _mapper():
    spec = GridSpec.from_voxel_counts(0.25, (8, 8, 8))
    origin = transforms.isometry_from_translation((-1.0, -1.0, -1.0))
    return OnlineMapper(spec, origin, "world")


def test_incremental_integration_latches_filled():
    m = _mapper()
    cam_pose = np.eye(4)
    # Frame 1: wall at z=0.8 (grid z index 7).
    m.integrate(voxelize.PointCloud.create(_plane_cloud(0.85), cam_pose))
    occ1 = np.asarray(m.occupancy_map.occupancy)
    assert (occ1 == 1.0).sum() > 0
    filled_before = occ1 == 1.0
    # Frame 2: wall closer (z=0.35) — new filled cells; old filled latch.
    m.integrate(voxelize.PointCloud.create(_plane_cloud(0.35), cam_pose))
    occ2 = np.asarray(m.occupancy_map.occupancy)
    assert (occ2[filled_before] == 1.0).all(), "filled cells must latch"
    assert (occ2 == 1.0).sum() > filled_before.sum()
    assert m.frames_integrated == 2


def test_scan_fold_matches_sequential():
    clouds = [voxelize.PointCloud.create(_plane_cloud(z), np.eye(4))
              for z in (0.85, 0.6, 0.35)]
    seq = _mapper()
    for c in clouds:
        seq.integrate(c)
    fold = _mapper()
    fold.integrate_frames(clouds)
    np.testing.assert_array_equal(np.asarray(seq.occupancy_map.occupancy),
                                  np.asarray(fold.occupancy_map.occupancy))
    assert fold.frames_integrated == 3


def test_sdf_cache_invalidation():
    m = _mapper()
    m.integrate(voxelize.PointCloud.create(_plane_cloud(0.85), np.eye(4)))
    s1 = m.sdf()
    assert m.sdf() is s1  # cached
    m.integrate(voxelize.PointCloud.create(_plane_cloud(0.35), np.eye(4)))
    s2 = m.sdf()
    assert s2 is not s1
    assert not np.array_equal(np.asarray(s1.distances),
                              np.asarray(s2.distances))


def test_render_and_localize():
    m = _mapper()
    m.integrate(voxelize.PointCloud.create(_plane_cloud(0.6, n=24), np.eye(4)))
    # Evaluate from INSIDE the carved free cone (the cloud camera's own
    # apex): a camera out in the unknown region renders the unknown
    # boundary, not the wall — its "depths" are meaningless (and the
    # depth_loss validity mask now rejects non-positive targets).
    pose = np.eye(4, dtype=np.float32)
    cam = render.PinholeCamera.create(pose, 16, 12, focal=14.0)
    target = np.asarray(m.render_depth(cam, num_steps=24).depth)
    assert target.min() > 0.0  # sane positive depths from free space
    # Perturb TOWARD the wall (stays inside the carved cone; a lateral
    # shift would be unobservable against a flat wall) and recover it.
    bad_pose = pose.copy()
    bad_pose[2, 3] += 0.08
    bad_cam = render.PinholeCamera.create(bad_pose, 16, 12, focal=14.0)
    fit = m.localize(bad_cam, target, num_iters=40, learning_rate=0.02,
                     num_steps=24)
    losses = np.asarray(fit.losses)
    assert fit.valid_fraction > 0.5  # the fit actually engaged
    assert losses[-1] < 0.5 * losses[0]


def test_extract_mesh_covers_integrated_wall():
    m = _mapper()
    m.integrate(voxelize.PointCloud.create(_plane_cloud(0.35), np.eye(4)))
    mesh = m.extract_mesh(max_triangles=4096)
    assert int(mesh.num_triangles) > 0 and not bool(mesh.overflowed)
    v = np.asarray(mesh.vertices)[np.asarray(mesh.valid)]
    # The carved wall sits at world z ~= 0.35; the zero level set must put
    # triangles within a voxel of it on the camera side.
    assert v.size > 0
    assert float(np.abs(v[..., 2] - 0.35).min()) < 0.5
