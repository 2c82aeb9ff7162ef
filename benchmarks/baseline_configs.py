"""Measure the BASELINE.md config table on real hardware.

Runs the five driver configs (BASELINE.json) single-chip and prints one
line per config. Not the driver benchmark (that is bench.py at the repo
root — ONE JSON line); this script populates BASELINE.md's results table.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from anywhere

import dataclasses
import time

import numpy as np


def _force(*xs):
    from voxelized_geometry_tools_tpu.utils import force_materialize
    force_materialize(*xs)


def timed(fn, *args, iters=5):
    out = fn(*args)
    _force(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.monotonic() - t0) / iters, out


def config1_estimate_distance():
    """64^3 single-box grid -> EDT SDF -> batched queries."""
    import jax
    import jax.numpy as jnp
    from voxelized_geometry_tools_tpu import GridSpec
    from voxelized_geometry_tools_tpu.ops import edt, sdf_query

    spec = GridSpec.from_voxel_counts(0.1, (64, 64, 64))
    occ = np.zeros(spec.counts, np.float32)
    occ[24:40, 24:40, 24:40] = 1.0
    edt_fn = jax.jit(lambda o: edt.extract_sdf_from_occupancy(
        o, spec, None).distances)
    t_edt, dist = timed(edt_fn, jnp.asarray(occ))
    from voxelized_geometry_tools_tpu.core.maps import SignedDistanceField
    sdf = SignedDistanceField.create(spec, dist, None, "c1", locked=True)
    pts = jnp.asarray(np.random.default_rng(0).uniform(
        0, 6.4, (1_000_000, 3)), jnp.float32)
    q_fn = jax.jit(lambda p: sdf_query.estimate_location_distance(
        sdf, p).value)
    t_q, _ = timed(q_fn, pts)
    table = jax.jit(sdf_query.build_corner_table)(sdf)
    qf_fn = jax.jit(lambda p, t: sdf_query.estimate_location_distance_fast(
        sdf, t, p).value)
    t_qf, _ = timed(lambda p: qf_fn(p, table), pts)
    print(f"config1 64^3: EDT {t_edt*1e3:.1f} ms "
          f"({spec.num_total/t_edt/1e6:.0f} Mvox/s); 1M trilinear queries "
          f"{t_q*1e3:.1f} ms ({1e6/t_q/1e6:.1f} M/s slow, "
          f"{1e6/t_qf/1e6:.1f} M/s corner-table)")


def config2_pointcloud_voxelization():
    """Single depth camera carved into a 128^3 grid."""
    import jax.numpy as jnp
    import jax
    from voxelized_geometry_tools_tpu import GridSpec, OccupancyMap
    from voxelized_geometry_tools_tpu.ops import voxelize

    spec = GridSpec.from_voxel_counts(0.02, (128, 128, 128))
    env = OccupancyMap.create(spec, None, "c2")
    # 640x480 synthetic depth camera 1m behind the grid looking +z.
    u, v = np.meshgrid(np.linspace(-0.5, 0.5, 640),
                       np.linspace(-0.4, 0.4, 480), indexing="ij")
    depth = 2.2 + 0.2 * np.sin(6 * u) * np.cos(6 * v)
    pts = np.stack([u * depth, v * depth, depth], -1).reshape(-1, 3)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (1.28, 1.28, -1.0)
    cloud = voxelize.PointCloud.create(pts.astype(np.float32), pose)
    options = voxelize.FilterOptions(1.0, 1, 1)

    # Column-marching carve via the accelerator backend (round 2 default).
    from voxelized_geometry_tools_tpu.ops import backends
    vox = backends.AcceleratorPointCloudVoxelizer()
    t, _ = timed(lambda: vox.voxelize_pointclouds(env, options,
                                                  [cloud]).occupancy)
    n_rays = pts.shape[0]
    print(f"config2 128^3 1-camera carve+filter: {t*1e3:.1f} ms "
          f"({n_rays/t/1e6:.2f} M rays/s, column carve)")


def config3_raycast_256():
    """256^3 grid, 640x480 depth render + voxel-gradient backward."""
    import jax
    import jax.numpy as jnp
    from voxelized_geometry_tools_tpu import GridSpec
    from voxelized_geometry_tools_tpu.core.maps import SignedDistanceField
    from voxelized_geometry_tools_tpu.ops import edt, render, sdf_query

    n = 256
    spec = GridSpec.from_voxel_counts(0.02, (n, n, n))
    xs, ys, zs = np.meshgrid(*[np.arange(n)] * 3, indexing="ij", sparse=True)
    filled = ((xs - n / 2) ** 2 + (ys - n / 2) ** 2
              + (zs - n / 2) ** 2) <= (n / 4) ** 2
    dist = jax.jit(lambda m: edt.signed_distance_from_filled_mask(
        m, spec.resolution))(jnp.asarray(filled))
    sdf = SignedDistanceField.create(spec, dist, None, "c3", locked=True)
    table = jax.jit(sdf_query.build_corner_table)(sdf)
    pose = np.eye(4, dtype=np.float32)
    sizes = np.asarray(spec.grid_sizes)
    pose[:3, 3] = sizes / 2.0 - np.array([0, 0, 1.2 * sizes[2]])
    cam = render.PinholeCamera.create(pose, 640, 480, focal=520.0)

    fwd = jax.jit(lambda d, t: render.render_depth(
        sdf.replace(distances=d), cam, num_steps=64, corner_table=t,
        early_exit=True, coarse_factor=8, head_steps=2,
        tail_chunks=64).depth)
    t_fwd, depth = timed(fwd, sdf.distances, table)

    def loss(d):
        r = render.render_depth(sdf.replace(distances=d), cam, num_steps=24,
                                corner_table=sdf_query.build_corner_table(
                                    sdf.replace(distances=d)))
        return jnp.nansum(jnp.where(r.hit, r.depth, 0.0))

    bwd = jax.jit(jax.grad(loss))
    t_bwd, g = timed(bwd, sdf.distances, iters=3)
    nz = int((np.asarray(g) != 0).sum())
    print(f"config3 256^3 640x480: forward {t_fwd*1e3:.1f} ms "
          f"({640*480/t_fwd/1e6:.2f} M rays/s); voxel-grad backward "
          f"(24-step scan) {t_bwd*1e3:.1f} ms, {nz} voxels touched")


def config4_mesh_fit():
    """Mesh -> 256^3-scale SDF -> differentiable render -> pose fit."""
    import jax.numpy as jnp
    from voxelized_geometry_tools_tpu.ops import edt, mesh, render
    from voxelized_geometry_tools_tpu.models import fusion_pipeline as fp

    vertices = np.array(
        [[0.3, 0.3, 0.3], [1.1, 0.3, 0.3], [1.1, 0.9, 0.3], [0.3, 0.9, 0.3],
         [0.3, 0.3, 0.7], [1.1, 0.3, 0.7], [1.1, 0.9, 0.7], [0.3, 0.9, 0.7]],
        np.float32)
    tris = np.array([(0, 2, 1), (0, 3, 2), (4, 5, 6), (4, 6, 7),
                     (0, 1, 5), (0, 5, 4), (2, 3, 7), (2, 7, 6),
                     (1, 2, 6), (1, 6, 5), (3, 0, 4), (3, 4, 7)], np.int32)
    t0 = time.monotonic()
    omap = mesh.rasterize_mesh_into_occupancy_map(
        jnp.asarray(vertices), jnp.asarray(tris), 0.02)
    _force(omap.occupancy)
    t_rast_cold = time.monotonic() - t0  # includes the one-time XLA compile
    t0 = time.monotonic()
    omap = mesh.rasterize_mesh_into_occupancy_map(
        jnp.asarray(vertices), jnp.asarray(tris), 0.02)
    _force(omap.occupancy)
    t_rast = time.monotonic() - t0
    sdf = edt.extract_sdf_from_occupancy(
        omap.occupancy, omap.spec, omap.origin_transform)
    center = np.asarray(omap.grid_index_to_location(
        jnp.asarray(omap.spec.counts, jnp.int32) // 2))
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = center + np.array([0, 0, -1.6], np.float32)
    cam = render.PinholeCamera.create(pose, 96, 72, focal=90.0)
    target = render.render_depth(sdf, cam, num_steps=48)
    perturb = jnp.asarray([0.03, -0.04, 0.02, 0.05, -0.06, 0.04], jnp.float32)
    start = dataclasses.replace(
        cam, pose=fp.perturb_pose(jnp.asarray(pose), perturb))
    t0 = time.monotonic()
    fit = fp.fit_camera_pose(sdf, start, target.depth, num_iters=120,
                             learning_rate=2e-2, num_steps=48)
    _force(fit.pose)
    t_fit = time.monotonic() - t0
    err0 = float(np.abs(np.asarray(start.pose) - pose).max())
    err1 = float(np.abs(np.asarray(fit.pose) - pose).max())
    print(f"config4 mesh({omap.spec.counts})->SDF->fit: rasterize "
          f"{t_rast*1e3:.0f} ms warm ({t_rast_cold*1e3:.0f} ms with one-time "
          f"compile); 120-iter pose fit {t_fit:.1f} s, "
          f"pose err {err0:.4f} -> {err1:.4f} "
          f"({'CONVERGED' if err1 < 0.5 * err0 else 'NOT CONVERGED'})")


if __name__ == "__main__":
    config1_estimate_distance()
    config2_pointcloud_voxelization()
    config3_raycast_256()
    config4_mesh_fit()
