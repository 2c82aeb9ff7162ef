"""Post-sparse-final clutter schedule re-check (round 5).

The round-5 sparse final sample dropped the clutter frame from ~10.5 ms to
~7.0 ms, which shifts the fixed-cost balance: the per-chunk dispatch/sort
cost is now ~43% of that frame (achieved_roofline_fraction 0.57). The
pre-change sweep (BASELINE.md "Clutter-schedule check") found the shipped
(tail=32, cone_tail=8, cone_steps=32) optimal; this re-runs the same small
sweep THROUGH the sparse-final path to confirm (or move) that conclusion,
and cross-checks any clutter winner on the sphere bench camera so a shipped
schedule always holds on both scenes.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
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
from voxelized_geometry_tools_tpu.utils import force_materialize

GRID_N = 512
IMG_W, IMG_H = 640, 480
NUM_STEPS = 64
GATHER_ROW_S = 9.3e-9


def build_scenes():
    spec = GridSpec.from_voxel_counts(0.01, (GRID_N,) * 3)
    xs, ys, zs = np.meshgrid(*[np.arange(GRID_N)] * 3, indexing="ij",
                             sparse=True)
    c, r = GRID_N / 2.0, GRID_N / 4.0
    sphere = ((xs - c) ** 2 + (ys - c) ** 2 + (zs - c) ** 2) <= r * r
    rng = np.random.default_rng(42)
    clutter = np.zeros((GRID_N,) * 3, bool)
    clutter[:, :, :24] = True
    for _ in range(14):
        cc = rng.uniform(0.15, 0.85, 3) * GRID_N
        cr = rng.uniform(20.0, 60.0)
        clutter |= ((xs - cc[0]) ** 2 + (ys - cc[1]) ** 2
                    + (zs - cc[2]) ** 2) <= cr * cr
    edt_fn = jax.jit(
        lambda m: edt.signed_distance_from_filled_mask(m, spec.resolution))
    scenes = {}
    for name, mask in (("sphere", sphere), ("clutter", clutter)):
        vals = edt_fn(jnp.asarray(mask))
        sdf = SignedDistanceField.create(spec, vals, None, name, locked=True)
        table = jax.jit(sdf_query.build_corner_table)(sdf)
        scenes[name] = (sdf, table)
    sizes = np.asarray(spec.grid_sizes)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = sizes / 2.0 - np.array([0.0, 0.0, 1.2 * sizes[2]])
    camera = render.PinholeCamera.create(pose, IMG_W, IMG_H, focal=520.0)
    return scenes, camera


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    scenes, camera = build_scenes()

    # (tail_chunks, cone_tail_chunks, cone_steps); shipped first.
    configs = [(32, 8, 32), (16, 8, 32), (8, 8, 32), (16, 4, 32), (8, 4, 16)]
    for tk, ctk, cs in configs:
        fn = jax.jit(lambda d, t, tk=tk, ctk=ctk, cs=cs: render.render_depth(
            scenes["sphere"][0].replace(distances=d), camera,
            num_steps=NUM_STEPS, corner_table=t, early_exit=True,
            coarse_factor=8, head_steps=0, tail_chunks=tk, cone_steps=cs,
            cone_tail_chunks=ctk).depth)
        sfn = jax.jit(lambda d, t, tk=tk, ctk=ctk, cs=cs: jax.tree.map(
            jnp.asarray, render.render_depth(
                scenes["sphere"][0].replace(distances=d), camera,
                num_steps=NUM_STEPS, corner_table=t, early_exit=True,
                coarse_factor=8, head_steps=0, tail_chunks=tk, cone_steps=cs,
                cone_tail_chunks=ctk, with_stats=True)[1]))
        for name in ("clutter", "sphere"):
            sdf, table = scenes[name]
            depth = fn(sdf.distances, table)
            force_materialize(depth)
            t0 = time.monotonic()
            for _ in range(args.iters):
                depth = fn(sdf.distances, table)
            force_materialize(depth)
            dt = (time.monotonic() - t0) / args.iters
            stats = jax.tree.map(np.asarray, sfn(sdf.distances, table))
            rows = render.gather_rows_from_stats(stats)
            hits = float((np.asarray(depth) < 99.0).mean())
            print(f"tail={tk:3d} cone_tail={ctk} cone_steps={cs:2d} "
                  f"{name:8s}: {dt * 1e3:7.2f} ms  "
                  f"{IMG_W * IMG_H / dt / 1e6:6.2f} M rays/s  "
                  f"rows={rows / 1e6:5.3f} M  "
                  f"frac={rows * GATHER_ROW_S / dt:4.2f}  hit={hits:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
