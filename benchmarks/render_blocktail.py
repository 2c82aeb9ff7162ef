"""Round-3 block-tail schedule benchmark.

Measures the head_steps=0 BLOCK-TAIL schedule (cone-slowness sort key at
cone-block granularity via ``sort_block``, plus certified-miss retirement
of rays whose block cone escaped the grid safe) against the shipped
head_steps=1 decay-sorted tail, on both bench cameras (focal 520 — the
headline config — and focal 600, the sweep camera), 512^3 sphere, 640x480.

The earlier head=0 attempt (BASELINE.md round-3 sweep: 44.9 ms) sorted
single rays by a cone-EDGE key; this one sorts whole cone blocks by the
cone's own march slowness and never marches certified-miss rays at all.
Run on the real chip.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from anywhere

import argparse
import json
import os
import time

import jax

if os.environ.get("VGT_CPU"):
    # In-process switch: the JAX_PLATFORMS env var is preempted by the
    # host's sitecustomize and hangs when the TPU tunnel is down.
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
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    a = p.parse_args()
    n, iters = a.n, a.iters
    w, h = a.width, a.height
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

    schedules = [
        dict(coarse_factor=4, head_steps=1, tail_chunks=64),  # shipped
        dict(coarse_factor=4, head_steps=2, tail_chunks=64),  # round-2 best
        dict(coarse_factor=8, head_steps=1, tail_chunks=64),
        dict(coarse_factor=4, head_steps=0, tail_chunks=64),
        dict(coarse_factor=4, head_steps=0, tail_chunks=32),
        dict(coarse_factor=8, head_steps=0, tail_chunks=64),
        dict(coarse_factor=4, head_steps=0, tail_chunks=64, cone_steps=32),
        dict(coarse_factor=4, head_steps=1, tail_chunks=64, cone_steps=32),
        dict(coarse_factor=8, head_steps=1, tail_chunks=64, cone_steps=32),
        dict(coarse_factor=16, head_steps=1, tail_chunks=64),
        dict(coarse_factor=16, head_steps=0, tail_chunks=64),
        dict(coarse_factor=4, head_steps=1, tail_chunks=64,
             cone_tail_chunks=8),
        dict(coarse_factor=4, head_steps=0, tail_chunks=64,
             cone_tail_chunks=8),
        dict(coarse_factor=8, head_steps=1, tail_chunks=64,
             cone_tail_chunks=8),
    ]
    all_results = {}
    for focal in (520.0, 600.0):
        cam = render.PinholeCamera.create(pose, w, h, focal=focal)
        rays = w * h
        # Equivalence oracle: the plain (no-cone) early-exit march. A
        # working prepass is hit-superset + depth-within-2*thresh, not
        # bitwise (BASELINE.md round-3 discovery section).
        base_fn = jax.jit(lambda d, t: render.render_depth(
            sdf.replace(distances=d), cam, num_steps=64,
            corner_table=t, early_exit=True))
        b = base_fn(sdf.distances, table)
        _force(b.depth)
        base_hit = np.asarray(b.hit)
        base_depth = np.asarray(b.depth)
        results = []
        for sched in schedules:
            fn = jax.jit(lambda d, t, s=tuple(sorted(sched.items())):
                         render.render_depth(
                             sdf.replace(distances=d), cam, num_steps=64,
                             corner_table=t, early_exit=True,
                             **dict(s)))
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
            results.append({**sched, "ms": dt * 1e3,
                            "mrays": rays / dt / 1e6,
                            "skipped_hits": skipped, "max_ddepth": dmax})
            print(f"focal={focal} {sched}: {dt*1e3:.1f} ms "
                  f"({rays/dt/1e6:.2f} M rays/s) skipped={skipped} "
                  f"max_dd={dmax:.2e}", flush=True)
        all_results[focal] = results

    # Batched multi-view: 4 cameras in ONE march (render_depth_batch,
    # head=0 block-tail) vs 4 sequential per-view calls. Round-2 found
    # naive batching SLOWER (full-width wave couples to the worst ray);
    # the block-tail schedule has no full-width phase to couple.
    cams = []
    for dx, dz in [(0.0, 1.2), (0.5, 1.4), (-0.5, 1.3), (0.2, 1.6)]:
        p = np.eye(4, dtype=np.float32)
        p[:3, 3] = (size / 2 + dx, size / 2, -dz * size)
        cams.append(render.PinholeCamera.create(p, w, h, focal=520.0))
    batched_cams = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    bfn = jax.jit(lambda d, t: render.render_depth_batch(
        sdf.replace(distances=d), batched_cams, num_steps=64,
        corner_table=t, coarse_factor=4, tail_chunks=64).depth)
    out = bfn(sdf.distances, table)
    _force(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = bfn(sdf.distances, table)
    _force(out)
    batch_dt = (time.monotonic() - t0) / iters
    sfn = jax.jit(lambda d, t, c: render.render_depth(
        sdf.replace(distances=d), c, num_steps=64, corner_table=t,
        early_exit=True, coarse_factor=4, head_steps=0,
        tail_chunks=64).depth)
    for c in cams:
        _force(sfn(sdf.distances, table, c))
    t0 = time.monotonic()
    for _ in range(iters):
        for c in cams:
            out = sfn(sdf.distances, table, c)
    _force(out)
    seq_dt = (time.monotonic() - t0) / iters
    n4 = 4 * w * h
    all_results["batch4"] = {
        "batched_ms": batch_dt * 1e3, "batched_mrays": n4 / batch_dt / 1e6,
        "sequential_ms": seq_dt * 1e3, "seq_mrays": n4 / seq_dt / 1e6}
    print(f"batch4: one-march {batch_dt*1e3:.1f} ms "
          f"({n4/batch_dt/1e6:.2f} M rays/s) vs sequential "
          f"{seq_dt*1e3:.1f} ms ({n4/seq_dt/1e6:.2f} M rays/s)",
          flush=True)
    print(json.dumps(all_results))


if __name__ == "__main__":
    main()


