"""Decompose the bench-scene render frame cost into its phases.

The 640x480 / 512^3 headline frame (cf=4, head=1, k=64) runs ~39 ms against
a ~9 ms pure-gather floor (307k rays x ~3 effective full-width samples x
9.3 ns/row). This script times each phase as its own jitted function on the
real chip to locate the other ~30 ms:

  * cone    — the cone-traced block prepass alone (19200 cones, 64 steps)
  * head    — ONE full-width march step from the cone starts
  * sort    — the convergence argsort + 6-array permute at 307k rays
  * full    — the whole render_depth for reference

Phase timings measured in isolation add launch/boundary overhead per probe,
so the sum exceeding `full` is expected; the signal is each phase's share.
Run on the real chip: ``python benchmarks/render_decompose.py``.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from anywhere

import json
import time

import jax

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


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _force(jax.tree.leaves(out)[0])
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    _force(jax.tree.leaves(out)[0])
    return (time.monotonic() - t0) / iters


def main():
    n = 512
    res = 0.01
    spec = GridSpec.from_voxel_counts(res, (n, n, n))
    xs, ys, zs = np.meshgrid(*[np.arange(n)] * 3, indexing="ij",
                             sparse=True)
    c, r = n / 2.0, n / 4.0
    mask = jnp.asarray(
        ((xs - c) ** 2 + (ys - c) ** 2 + (zs - c) ** 2) <= r * r)
    values = jax.jit(
        lambda m: edt.signed_distance_from_filled_mask(m, res))(mask)
    sdf = SignedDistanceField.create(spec, values, locked=True)
    table = jax.jit(sdf_query.build_corner_table)(sdf)

    sizes = np.asarray(spec.grid_sizes)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = sizes / 2.0 - np.array([0.0, 0.0, 1.2 * sizes[2]])
    cam = render.PinholeCamera.create(pose, 640, 480, focal=520.0)
    rays = 640 * 480
    results = {}

    # Full frame (round-4 headline schedule).
    full_fn = jax.jit(lambda d, t: render.render_depth(
        sdf.replace(distances=d), cam, num_steps=64, corner_table=t,
        early_exit=True, coarse_factor=8, head_steps=0,
        tail_chunks=32, cone_steps=32, cone_tail_chunks=8).depth)
    results["full_ms"] = timeit(full_fn, sdf.distances, table) * 1e3

    # Cone prepass alone (round-4 config: cf=8, 32-step cone budget,
    # 8-chunk cone tail).
    thresh = 0.25 * res
    cone_fn = jax.jit(lambda d, t: render._cone_prepass(
        sdf.replace(distances=d), cam, 8, 64, thresh, 100.0, t,
        max_cone_steps=32, cone_tail_chunks=8))
    results["cone_ms"] = timeit(cone_fn, sdf.distances, table) * 1e3

    # Cone without its chunked tail (the tail's own net value).
    cone1_fn = jax.jit(lambda d, t: render._cone_prepass(
        sdf.replace(distances=d), cam, 8, 64, thresh, 100.0, t,
        max_cone_steps=32))
    results["cone_nochunk_ms"] = timeit(cone1_fn, sdf.distances,
                                        table) * 1e3

    # No-cone variant — the prepass's net value on this scene.
    nocone_fn = jax.jit(lambda d, t: render.render_depth(
        sdf.replace(distances=d), cam, num_steps=64, corner_table=t,
        early_exit=True, coarse_factor=0, head_steps=1,
        tail_chunks=32).depth)
    results["nocone_full_ms"] = timeit(nocone_fn, sdf.distances, table) * 1e3

    # One full-width march step from the cone starts (gather + update).
    origins, dirs = render.camera_rays(cam)

    def one_step(d, t, t0):
        s2 = sdf.replace(distances=d)
        pos = origins + dirs * t0[..., None]
        q = sdf_query.estimate_location_distance_fast(s2, t, pos)
        return t0 + jnp.maximum(q.value, 0.0)

    step_fn = jax.jit(one_step)
    t_init = cone_fn(sdf.distances, table)[0]
    # Block-granular sort (the shipped sort_block=64 path): 4800 keys +
    # whole-block permutes instead of 307k single-ray rows.
    keyb = jax.random.uniform(jax.random.PRNGKey(9), (rays // 64,))
    arrsb = [jax.random.uniform(jax.random.PRNGKey(10 + i),
                                (rays // 64, 64)) for i in range(6)]

    def sortb(key, arrs):
        order = jnp.argsort(key, stable=True)
        return [a[order] for a in arrs]

    results["sort_block_ms"] = timeit(jax.jit(sortb), keyb, arrsb) * 1e3
    results["head_step_ms"] = timeit(
        step_fn, sdf.distances, table, t_init) * 1e3

    # Convergence sort + 6-array permute at full width.
    key = jax.random.uniform(jax.random.PRNGKey(0), (rays,))
    arrs = [jax.random.uniform(jax.random.PRNGKey(i), (rays,))
            for i in range(1, 7)]

    def sort6(key, arrs):
        order = jnp.argsort(key, stable=True)
        return [a[order] for a in arrs]

    results["sort6_ms"] = timeit(jax.jit(sort6), key, arrs) * 1e3

    # Tail cost by subtraction is unreliable across processes; report the
    # remainder of the in-context frame instead.
    results["remainder_ms"] = (results["full_ms"] - results["cone_ms"]
                               - results["head_step_ms"]
                               - results["sort6_ms"])
    results["mrays_full"] = rays / results["full_ms"] / 1e3
    print(json.dumps(results))


if __name__ == "__main__":
    main()
