"""Benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): rays/sec/chip for sphere-traced raycasting over a
512^3-voxel SDF (640x480 depth image, 64 march steps budget), plus EDT
voxels/sec as a secondary field.

Baseline (``vs_baseline``): the reference publishes no numbers (BASELINE.md),
so the denominator is the 70%-of-roofline north-star target where the
roofline is the *measured physical limit of the op that bounds the
computation*. Sphere tracing is bound by gathers: on v5e the gather engine
issues ~9.3 ns per gathered row at multi-million-row batches (re-measured by
benchmarks/roofline.py; an earlier 26 ns figure was a small-batch artifact),
independent of row width 4-512 B and table size 0.5-4 GiB. The round-1
"~6M rays/s practical ceiling" (>=6 full-width samples/ray) was beaten in
round 2 by moving most samples to 1/64-width cone-prepass rays and pruning
the rest with a convergence-sorted tail (~3 effective full-width
samples/ray -> 7.9M measured, BASELINE.md). We keep the original ambitious
fixed target of 35M rays/s (= 70% of the 32-byte-transaction HBM roofline
for one-sample rays) so ``vs_baseline`` stays comparable across rounds.

Timing note: ``block_until_ready`` is unreliable through the axon TPU tunnel
(returns early), so every timed section forces a scalar read from the result
buffer, which cannot complete before the computation does.
"""

import json
import time

import numpy as np

GRID_N = 512
IMG_W, IMG_H = 640, 480
NUM_STEPS = 64
HBM_BYTES_PER_SEC = 819e9  # TPU v5e
BYTES_PER_RAY = NUM_STEPS * 32  # steps * one 32-byte corner-brick row
ROOFLINE_RAYS = HBM_BYTES_PER_SEC / BYTES_PER_RAY
BASELINE_RAYS = 35e6  # fixed north-star target (70% of 1-sample-ray HBM)
# Measured v5e gather-engine issue rate per row at multi-million-row
# batches, independent of row width 4-512 B (benchmarks/roofline.py).
# ideal_frame_s = gather_rows * ROW_NS is the speed-of-light frame time
# for the gather-bound schedule; achieved_roofline_fraction audits the
# north star's ">=70% HBM roofline" claim with a NUMBER (round-4
# VERDICT #1) instead of an argument.
GATHER_ROW_S = 9.3e-9


def _force(x):
    """Materialize a device array (4-byte D2H; see
    utils.profiling.force_materialize for why block_until_ready and full
    np.asarray are both wrong through the tunnel)."""
    from voxelized_geometry_tools_tpu.utils import force_materialize
    force_materialize(x)


def main():
    import jax
    # Persistent compile cache: first compiles through the tunnel are
    # service-load dependent (7-300 s per program; a cold full bench has
    # taken >14 min) — cache them so re-runs on the same host start hot.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from voxelized_geometry_tools_tpu import GridSpec
    from voxelized_geometry_tools_tpu.ops import edt, render, sdf_query

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
    sdf_values = edt_fn(mask)
    _force(sdf_values)  # compile + warmup
    # Pipeline several dispatches and force once, like carve/render below:
    # a single timed call includes the tunnel's 6-31 ms service-load-
    # dependent dispatch floor — 3-14% noise on a ~200 ms EDT (the
    # 620/647/683 M voxels/s wobble across BENCH_r01-r03).
    edt_iters = 5
    t0 = time.monotonic()
    for _ in range(edt_iters):
        sdf_values = edt_fn(mask)
    _force(sdf_values)
    edt_time = (time.monotonic() - t0) / edt_iters
    edt_voxels_per_sec = spec.num_total / edt_time

    from voxelized_geometry_tools_tpu.core.maps import SignedDistanceField
    sdf = SignedDistanceField.create(spec, sdf_values, None, "bench",
                                     locked=True)

    # --- Acceleration structure (built once per locked SDF) ------------
    # No mip: an exact SDF already self-skips empty space (sphere-trace
    # steps equal the true distance), so the coarse phase only adds gather
    # cost — measured slower on this scene. Mip stays available for
    # truncated/occupancy-derived fields.
    table_fn = jax.jit(sdf_query.build_corner_table)
    table = table_fn(sdf)
    _force(table.rows)
    t0 = time.monotonic()
    table = table_fn(sdf)
    _force(table.rows)
    accel_build_time = time.monotonic() - t0

    # --- Raycast benchmark ----------------------------------------------
    sizes = np.asarray(spec.grid_sizes)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = sizes / 2.0 - np.array([0.0, 0.0, 1.2 * sizes[2]])
    camera = render.PinholeCamera.create(pose, IMG_W, IMG_H, focal=520.0)

    # Round-4 schedule (BASELINE.md blocktail sweeps + exact-camera sweep,
    # real chip): one cone per 8x8 pixel block (32-step budget, its own
    # 8-chunk sorted tail), NO full-width fine steps — the tail sorts
    # whole cone BLOCKS by the cone's own march slowness and retires
    # escape-certified rays (44% of this camera's rays) without marching
    # them. 29.2 ms / 10.5 M rays/s on THIS camera vs 47.5 ms for
    # cf=8/head=1: with a WORKING prepass any full-width head step is
    # pure cost. (The z=-6.144 sweep camera reads 22.3 ms / 13.8 M with
    # the same schedule family — scene geometry moves the absolute rate.)
    render_fn = jax.jit(lambda d, t: render.render_depth(
        sdf.replace(distances=d), camera, num_steps=NUM_STEPS,
        corner_table=t, early_exit=True, coarse_factor=8,
        head_steps=0, tail_chunks=32, cone_steps=32,
        cone_tail_chunks=8).depth)
    depth = render_fn(sdf.distances, table)
    _force(depth)  # compile + warmup

    n_rays = IMG_W * IMG_H
    iters = 10
    t0 = time.monotonic()
    for _ in range(iters):
        depth = render_fn(sdf.distances, table)
    _force(depth)
    render_time = (time.monotonic() - t0) / iters
    rays_per_sec = n_rays / render_time

    hit_frac = float((np.asarray(depth) < 99.0).mean())

    # --- Roofline audit (round-4 VERDICT #1) ----------------------------
    # One instrumented frame (outside the timed loop) counts the gather/
    # scatter rows the shipped schedule actually issues — march samples
    # per while-loop iteration, compaction permutes, the final sample —
    # and converts them to the gather-engine speed-of-light frame time.
    stats_fn = jax.jit(lambda d, t: jax.tree.map(
        jnp.asarray, render.render_depth(
            sdf.replace(distances=d), camera, num_steps=NUM_STEPS,
            corner_table=t, early_exit=True, coarse_factor=8,
            head_steps=0, tail_chunks=32, cone_steps=32,
            cone_tail_chunks=8, with_stats=True)[1]))
    frame_stats = jax.tree.map(np.asarray, stats_fn(sdf.distances, table))
    gather_rows = render.gather_rows_from_stats(frame_stats)
    ideal_frame_s = gather_rows * GATHER_ROW_S
    roofline_fraction = ideal_frame_s / render_time

    # --- Cluttered second scene (round-4 VERDICT #3) --------------------
    # Every prior headline came from the one centered sphere the schedule
    # was tuned on. The reference's production shape is multi-camera fused
    # CLUTTER (example/pointcloud_voxelization.cpp:166-226), so render a
    # multi-object scene — scattered spheres over a floor slab — with the
    # SAME shipped schedule and record both scenes' rates. Grid/image
    # shapes are identical, so edt_fn/table_fn/render_fn all reuse their
    # compiled executables.
    rng = np.random.default_rng(42)
    clutter = np.zeros((GRID_N, GRID_N, GRID_N), bool)
    clutter[:, :, :24] = True  # floor slab (+z is up in grid frame)
    for _ in range(14):
        cc = rng.uniform(0.15, 0.85, 3) * GRID_N
        cr = rng.uniform(20.0, 60.0)
        clutter |= ((xs - cc[0]) ** 2 + (ys - cc[1]) ** 2
                    + (zs - cc[2]) ** 2) <= cr * cr
    clutter_vals = edt_fn(jnp.asarray(clutter))
    clutter_sdf = SignedDistanceField.create(spec, clutter_vals, None,
                                             "clutter", locked=True)
    clutter_table = table_fn(clutter_sdf)
    cdepth = render_fn(clutter_vals, clutter_table)
    _force(cdepth)  # warm (cache hit — same shapes)
    t0 = time.monotonic()
    for _ in range(iters):
        cdepth = render_fn(clutter_vals, clutter_table)
    _force(cdepth)
    clutter_render_time = (time.monotonic() - t0) / iters
    clutter_rays_per_sec = n_rays / clutter_render_time
    clutter_hit_frac = float((np.asarray(cdepth) < 99.0).mean())
    clutter_stats = jax.tree.map(np.asarray,
                                 stats_fn(clutter_vals, clutter_table))
    clutter_rows = render.gather_rows_from_stats(clutter_stats)
    clutter_fraction = clutter_rows * GATHER_ROW_S / clutter_render_time

    # --- Reference-equivalent CPU baseline -----------------------------
    # The native C++ runtime reimplements the reference's F-H EDT exactly
    # (native/vgt_native.cpp); measuring it on this host gives the honest
    # same-machine CPU number the reference would post (no published
    # numbers exist — BASELINE.md). 128^3 keeps the bench fast; the
    # per-voxel rate is scale-stable for this O(n) transform.
    native_edt_rate = None
    try:
        from voxelized_geometry_tools_tpu import native
        if native.available():
            n_small = 128
            ax = np.arange(n_small)
            sx, sy, sz = np.meshgrid(ax, ax, ax, indexing="ij", sparse=True)
            small = (((sx - 64) ** 2 + (sy - 64) ** 2 + (sz - 64) ** 2)
                     <= 32 * 32).astype(np.uint8)
            native.edt_sdf(small, 0.01)  # warm the code path
            # Median-of-3: the host CPU comparators wobbled 13-19 M
            # voxels/s across rounds from single-run host-load noise.
            times = []
            for _ in range(3):
                t0 = time.monotonic()
                native.edt_sdf(small, 0.01)
                times.append(time.monotonic() - t0)
            native_edt_rate = n_small ** 3 / sorted(times)[1]
    except Exception:
        pass

    # --- Carve benchmark (config2: 640x480 depth camera -> 128^3) -------
    # Column-marching carve (ops/voxelize.raycast_pointcloud_columns) vs
    # the reference-equivalent native CPU DDA on this host.
    carve_rays_per_sec = None
    native_carve_rays_per_sec = None
    try:
        import dataclasses
        from voxelized_geometry_tools_tpu import GridSpec as _GS
        from voxelized_geometry_tools_tpu.ops import voxelize as _vx
        cspec = _GS.from_voxel_counts(0.02, (128, 128, 128))
        cu, cv = np.meshgrid(np.linspace(-0.5, 0.5, 640),
                             np.linspace(-0.4, 0.4, 480), indexing="ij")
        cdep = 2.2 + 0.2 * np.sin(6 * cu) * np.cos(6 * cv)
        cpts = np.stack([cu * cdep, cv * cdep, cdep], -1).reshape(-1, 3)
        cpose = np.eye(4, dtype=np.float32)
        cpose[:3, 3] = (1.28, 1.28, -1.0)
        ccloud = _vx.PointCloud.create(cpts.astype(np.float32), cpose)
        carve_fn = jax.jit(lambda p: _vx.raycast_pointcloud_columns(
            cspec, jnp.eye(4), dataclasses.replace(ccloud, points=p),
            run_axis=2).seen_free)
        out = carve_fn(ccloud.points)
        _force(out)
        # Pipeline several dispatches and force once: a single timed call
        # includes the tunnel's 6-31 ms service-load-dependent dispatch
        # floor (measured, benchmarks/inkernel_microbench.py), which is
        # what made round-2's BENCH carve read 2.69 M rays/s while the
        # multi-iteration BASELINE.md measurement read 3.31 M.
        carve_iters = 5
        t0 = time.monotonic()
        for _ in range(carve_iters):
            out = carve_fn(ccloud.points)
        _force(out)
        carve_rays_per_sec = (carve_iters * cpts.shape[0]
                              / (time.monotonic() - t0))
        from voxelized_geometry_tools_tpu import native
        if native.available():
            times = []
            for _ in range(3):  # median-of-3, same rationale as native EDT
                t0 = time.monotonic()
                native.raycast(cpose[:3, 3].astype(np.float32),
                               (cpts + cpose[:3, 3]).astype(np.float32),
                               float("inf"), cspec.counts, cspec.resolution,
                               0)
                times.append(time.monotonic() - t0)
            native_carve_rays_per_sec = cpts.shape[0] / sorted(times)[1]
    except Exception:
        pass

    print(json.dumps({
        "metric": "rays_per_sec_chip_512cube_sdf_raycast",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / BASELINE_RAYS,
        "extras": {
            "edt_voxels_per_sec": edt_voxels_per_sec,
            "edt_time_s_512cube": edt_time,
            "render_time_s_640x480": render_time,
            "accel_build_time_s": accel_build_time,
            "num_march_steps": NUM_STEPS,
            "roofline_rays_per_sec": ROOFLINE_RAYS,
            "hit_fraction": hit_frac,
            "gather_rows_per_frame": gather_rows,
            "ideal_frame_s_at_9p3ns_per_row": ideal_frame_s,
            "achieved_roofline_fraction": roofline_fraction,
            "clutter_rays_per_sec": clutter_rays_per_sec,
            "clutter_render_time_s": clutter_render_time,
            "clutter_hit_fraction": clutter_hit_frac,
            "clutter_gather_rows_per_frame": clutter_rows,
            "clutter_achieved_roofline_fraction": clutter_fraction,
            "native_cpu_edt_voxels_per_sec": native_edt_rate,
            "tpu_edt_speedup_vs_reference_cpu": (
                edt_voxels_per_sec / native_edt_rate
                if native_edt_rate else None),
            "carve_rays_per_sec_config2": carve_rays_per_sec,
            "native_cpu_carve_rays_per_sec_config2":
                native_carve_rays_per_sec,
        },
    }))


if __name__ == "__main__":
    main()
