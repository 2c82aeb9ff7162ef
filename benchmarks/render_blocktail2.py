"""Round-4 refinement sweep around the block-tail winner.

The round-4 first sweep (render_blocktail.py, real chip) found the working
prepass's best schedule is head_steps=0 + block-sorted tail + certified-miss
retirement, with coarse_factor=8 (24.3 ms / 12.64 M rays/s on the bench
camera vs 50.8 ms for the shipped cf=4/head=1). This sweep refines around
that point — cone_tail_chunks / cone_steps / tail_chunks / cf interplay at
head=0 — and instruments WHY: per-schedule certificate stats (fraction of
rays retired by the escape certificate, mean certified advance) from the
prepass outputs, so BASELINE.md can record where the win comes from.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from anywhere

import argparse
import json
import os
import time

import jax

if os.environ.get("VGT_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from voxelized_geometry_tools_tpu import GridSpec
from voxelized_geometry_tools_tpu.core.maps import SignedDistanceField
from voxelized_geometry_tools_tpu.ops import edt, render, sdf_query


def _force(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    a = p.parse_args()
    n, iters = a.n, a.iters
    w, h = 640, 480
    res = 0.01
    spec = GridSpec.from_voxel_counts(res, (n, n, n))
    ax = (jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2.0) ** 2
    mask = (ax[:, None, None] + ax[None, :, None]
            + ax[None, None, :]) <= (n / 4.0) ** 2
    values = edt._sdf_values_from_mask(mask, res)
    sdf = SignedDistanceField.create(spec, values, locked=True)
    table = jax.jit(sdf_query.build_corner_table)(sdf)

    size = n * res
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = (size / 2, size / 2, -1.2 * size)
    cam = render.PinholeCamera.create(pose, w, h, focal=520.0)
    rays = w * h

    # Certificate stats per (cf, cone_steps, cone_tail_chunks): how many
    # rays the escape certificate retires before any marching, and the mean
    # certified advance (voxels) for the rest. This is the instrumentation
    # round-3 VERDICT asked for — CPU-scene stats are not chip numbers.
    thresh = 0.25 * res
    origins, dirs = render.camera_rays(cam)
    t_enter, t_exit, hits_grid = render._clip_to_grid(sdf, origins, dirs)
    t_stop = jnp.minimum(t_exit, jnp.float32(100.0))
    stats = {}
    for cf, cs, ctc in [(4, None, 1), (8, None, 1), (16, None, 1),
                        (8, 32, 1), (8, None, 8)]:
        pre = jax.jit(lambda d, t, cf=cf, cs=cs, ctc=ctc:
                      render._cone_prepass(
                          sdf.replace(distances=d), cam, cf, 64, thresh,
                          100.0, t, max_cone_steps=cs,
                          cone_tail_chunks=ctc))
        t_init, t_valid, slow, esc = pre(sdf.distances, table)
        killed = np.asarray(esc & (t_stop <= t_init)
                            & (t_enter >= t_valid))
        adv = np.asarray(jnp.maximum(t_init - jnp.maximum(t_enter, 0.0),
                                     0.0) / res)
        hg = np.asarray(hits_grid)
        key = f"cf={cf},cone_steps={cs},ctc={ctc}"
        stats[key] = {
            "retired_frac_of_grid_rays": float(killed[hg].mean()),
            "mean_certified_advance_voxels": float(adv[hg].mean()),
            "mean_cone_slowness": float(np.asarray(slow)[hg].mean()),
        }
        print(key, stats[key], flush=True)

    base_fn = jax.jit(lambda d, t: render.render_depth(
        sdf.replace(distances=d), cam, num_steps=64,
        corner_table=t, early_exit=True))
    b = base_fn(sdf.distances, table)
    _force(b.depth)
    base_hit = np.asarray(b.hit)
    base_depth = np.asarray(b.depth)

    schedules = [
        dict(coarse_factor=8, head_steps=0, tail_chunks=64),  # sweep-1 best
        dict(coarse_factor=8, head_steps=0, tail_chunks=32),
        dict(coarse_factor=8, head_steps=0, tail_chunks=128),
        dict(coarse_factor=8, head_steps=0, tail_chunks=64,
             cone_tail_chunks=8),
        dict(coarse_factor=8, head_steps=0, tail_chunks=64,
             cone_tail_chunks=16),
        dict(coarse_factor=16, head_steps=0, tail_chunks=64,
             cone_tail_chunks=8),
        dict(coarse_factor=8, head_steps=0, tail_chunks=64, cone_steps=32),
        dict(coarse_factor=8, head_steps=0, tail_chunks=64, cone_steps=48),
        dict(coarse_factor=16, head_steps=0, tail_chunks=64, cone_steps=32),
        dict(coarse_factor=8, head_steps=0, tail_chunks=64, cone_steps=32,
             cone_tail_chunks=8),
    ]
    results = []
    for sched in schedules:
        fn = jax.jit(lambda d, t, s=tuple(sorted(sched.items())):
                     render.render_depth(
                         sdf.replace(distances=d), cam, num_steps=64,
                         corner_table=t, early_exit=True, **dict(s)))
        r = fn(sdf.distances, table)
        _force(r.depth)
        t0 = time.monotonic()
        for _ in range(iters):
            r = fn(sdf.distances, table)
        _force(r.depth)
        dt = (time.monotonic() - t0) / iters
        hit = np.asarray(r.hit)
        skipped = int((base_hit & ~hit).sum())
        m = base_hit & hit
        dmax = float(np.abs(np.asarray(r.depth)[m]
                            - base_depth[m]).max()) if m.any() else 0.0
        results.append({**sched, "ms": dt * 1e3, "mrays": rays / dt / 1e6,
                        "skipped_hits": skipped, "max_ddepth": dmax})
        print(f"{sched}: {dt*1e3:.1f} ms ({rays/dt/1e6:.2f} M rays/s) "
              f"skipped={skipped} max_dd={dmax:.2e}", flush=True)
    print(json.dumps({"stats": stats, "schedules": results}))


if __name__ == "__main__":
    main()
