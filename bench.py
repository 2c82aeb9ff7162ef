"""Benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): rays/sec/chip for sphere-traced raycasting over a
512^3-voxel SDF (640x480 depth image, 64 march steps), plus EDT voxels/sec as
a secondary field.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is the 70%-of-HBM-roofline target from BASELINE.json's north star:
each march step trilinearly samples 8 voxels; at HBM transaction granularity
(32 B/gather on v5e) a 64-step ray moves ~16 KiB, so 100% of ~819 GB/s is
~50 M rays/s and the 70% target is ~35 M rays/s. vs_baseline =
measured / 35e6 (>= 1.0 means the north-star target is met).
"""

import json
import time

import numpy as np

GRID_N = 512
IMG_W, IMG_H = 640, 480
NUM_STEPS = 64
HBM_BYTES_PER_SEC = 819e9  # TPU v5e
BYTES_PER_RAY = NUM_STEPS * 8 * 32  # steps * corners * gather granule
ROOFLINE_RAYS = HBM_BYTES_PER_SEC / BYTES_PER_RAY
BASELINE_RAYS = 0.70 * ROOFLINE_RAYS


def main():
    import jax
    import jax.numpy as jnp
    from voxelized_geometry_tools_tpu import GridSpec
    from voxelized_geometry_tools_tpu.ops import edt, render

    spec = GridSpec.from_voxel_counts(0.01, (GRID_N, GRID_N, GRID_N))
    xs, ys, zs = np.meshgrid(*[np.arange(GRID_N)] * 3, indexing="ij",
                             sparse=True)
    c = GRID_N / 2.0
    r = GRID_N / 4.0
    filled = ((xs - c) ** 2 + (ys - c) ** 2 + (zs - c) ** 2) <= r * r

    # --- EDT benchmark -------------------------------------------------
    edt_fn = jax.jit(
        lambda m: edt.signed_distance_from_filled_mask(m, spec.resolution))
    mask = jnp.asarray(filled)
    sdf_values = edt_fn(mask).block_until_ready()  # compile + warmup
    t0 = time.monotonic()
    sdf_values = edt_fn(mask).block_until_ready()
    edt_time = time.monotonic() - t0
    edt_voxels_per_sec = spec.num_total / edt_time

    from voxelized_geometry_tools_tpu.core.maps import SignedDistanceField
    sdf = SignedDistanceField.create(spec, sdf_values, None, "bench",
                                     locked=True)

    # --- Raycast benchmark ----------------------------------------------
    sizes = np.asarray(spec.grid_sizes)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = sizes / 2.0 - np.array([0.0, 0.0, 1.2 * sizes[2]])
    camera = render.PinholeCamera.create(pose, IMG_W, IMG_H, focal=520.0)

    render_fn = jax.jit(lambda d: render.render_depth(
        sdf.replace(distances=d), camera, num_steps=NUM_STEPS).depth)
    depth = render_fn(sdf.distances).block_until_ready()  # compile + warmup

    n_rays = IMG_W * IMG_H
    iters = 10
    t0 = time.monotonic()
    for _ in range(iters):
        depth = render_fn(sdf.distances)
    depth.block_until_ready()
    render_time = (time.monotonic() - t0) / iters
    rays_per_sec = n_rays / render_time

    hit_frac = float(np.isfinite(np.asarray(depth)).mean())

    print(json.dumps({
        "metric": "rays_per_sec_chip_512cube_sdf_raycast",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / BASELINE_RAYS,
        "extras": {
            "edt_voxels_per_sec": edt_voxels_per_sec,
            "edt_time_s_512cube": edt_time,
            "render_time_s_640x480": render_time,
            "num_march_steps": NUM_STEPS,
            "roofline_rays_per_sec": ROOFLINE_RAYS,
            "depth_finite_fraction": hit_frac,
        },
    }))


if __name__ == "__main__":
    main()
