"""Roofline report: achieved vs physical-limit rates for every hot op.

The north star asks for kernels "profiled to speed-of-light HBM bandwidth
per chip". On v5e the binding resources differ per op — the gather/scatter
issue engine for sampling and carving, the VPU for the EDT's min-plus math,
HBM bandwidth for streaming passes — so each row below compares the
measured rate against the *measured physical limit of its binding op*
(microbenchmarked in-process, not a datasheet number).

Run on the real chip: ``python benchmarks/roofline.py``. One table, plus a
JSON line for machines.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from anywhere

import json
import time

import numpy as np


def _force(x):
    from voxelized_geometry_tools_tpu.utils import force_materialize
    force_materialize(x)


def _timeit(fn, *args, iters=5):
    out = fn(*args)
    _force(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.monotonic() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from voxelized_geometry_tools_tpu import GridSpec
    from voxelized_geometry_tools_tpu.core.maps import SignedDistanceField
    from voxelized_geometry_tools_tpu.ops import edt, render, sdf_query

    rows = []
    rng = np.random.default_rng(0)

    # --- Physical limits, measured ------------------------------------
    # 1. Gather issue rate: random row gathers from a large HBM table.
    table = jnp.asarray(rng.standard_normal((2 ** 24, 8)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 2 ** 24, 4_000_000), jnp.int32)
    gather_fn = jax.jit(lambda t, i: jnp.sum(t[i], axis=0))
    t = _timeit(gather_fn, table, idx)
    gather_rate = idx.shape[0] / t
    rows.append(("gather rows/s (4M random rows, 32B each)", gather_rate,
                 gather_rate, 1.0))

    # 2. Scatter-add issue rate.
    scat_fn = jax.jit(
        lambda i: jnp.zeros(2 ** 24, jnp.int32).at[i].add(1))
    t = _timeit(scat_fn, idx)
    scatter_rate = idx.shape[0] / t
    rows.append(("scatter-add rows/s (4M random)", scatter_rate,
                 scatter_rate, 1.0))

    # 3. HBM stream bandwidth (big elementwise copy+add).
    big = jnp.asarray(rng.standard_normal(2 ** 27), jnp.float32)  # 512 MB
    stream_fn = jax.jit(lambda x: x * 1.0001 + 1.0)
    t = _timeit(stream_fn, big)
    stream_bw = 2 * big.size * 4 / t  # read + write
    rows.append(("HBM stream GB/s", stream_bw / 1e9, stream_bw / 1e9, 1.0))

    # 4. VPU f32 min-plus rate — the EDT envelope's primitive: one
    # candidate evaluation is sub + mul + add + min with a serial
    # dependence through the running minimum (exactly the pattern of
    # kernels/edt_pallas proc_chunk). Compute-bound by construction:
    # 8 MB resident, 256 chained evaluations per element.
    blk = jnp.asarray(rng.standard_normal((32, 65536)), jnp.float32)

    def minplus(x):
        d = jnp.full_like(x, jnp.inf)
        q = x * 0.5
        for u in range(256):
            delta = q - jnp.float32(u)
            d = jnp.minimum(d, delta * delta + x)
        return d

    t = _timeit(jax.jit(minplus), blk)
    vpu_evals = blk.size * 256 / t
    rows.append(("VPU min-plus candidate evals/s (EDT envelope primitive)",
                 vpu_evals, vpu_evals, 1.0))

    # --- Hot ops vs their binding limit ---------------------------------
    N = 512
    spec = GridSpec.from_voxel_counts(0.01, (N, N, N))
    xs, ys, zs = np.meshgrid(*[np.arange(N)] * 3, indexing="ij", sparse=True)
    filled = jnp.asarray(
        ((xs - N / 2) ** 2 + (ys - N / 2) ** 2 + (zs - N / 2) ** 2)
        <= (N / 4) ** 2)

    # EDT (VPU-bound; the limit is the XLA min-plus at the same math rate —
    # report achieved voxels/s and the speedup of the adaptive kernel).
    edt_fn = jax.jit(
        lambda m: edt.signed_distance_from_filled_mask(m, 0.01))
    t = _timeit(edt_fn, filled, iters=3)
    edt_rate = N ** 3 / t
    edt_xla_fn = jax.jit(lambda m: edt.signed_distance_from_filled_mask(
        m, 0.01, backend="xla"))
    t_xla = _timeit(edt_xla_fn, filled, iters=3)
    rows.append(("EDT voxels/s (512^3 signed; windowed pallas vs XLA "
                 "min-plus)", edt_rate, N ** 3 / t_xla, edt_rate * t_xla
                 / N ** 3))

    # Trilinear sampling (gather-bound: 1 gather per sample).
    sdf = SignedDistanceField.create(spec, edt_fn(filled), None, "r",
                                     locked=True)
    ctable = jax.jit(sdf_query.build_corner_table)(sdf)
    _force(ctable.rows)
    pts = jnp.asarray(
        rng.uniform(0.2, 5.0, (4_000_000, 3)).astype(np.float32))
    samp_fn = jax.jit(lambda t_, p: jnp.sum(
        sdf_query.estimate_location_distance_fast(sdf, t_, p).value))
    t = _timeit(samp_fn, ctable, pts)
    samp_rate = pts.shape[0] / t
    rows.append(("trilinear samples/s (corner table; limit = gather rate)",
                 samp_rate, gather_rate, samp_rate / gather_rate))

    # Sphere-traced render (gather-bound; limit = gather_rate / avg
    # samples-per-ray at this scene's measured march profile, ~5.8).
    sizes = np.asarray(spec.grid_sizes)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = sizes / 2.0 - np.array([0.0, 0.0, 1.2 * sizes[2]])
    cam = render.PinholeCamera.create(pose, 640, 480, focal=520.0)
    render_fn = jax.jit(lambda d, t_: render.render_depth(
        sdf.replace(distances=d), cam, num_steps=64, corner_table=t_,
        early_exit=True).depth)
    t = _timeit(render_fn, sdf.distances, ctable)
    ray_rate = 640 * 480 / t
    ideal_rays = gather_rate / 5.8
    rows.append(("render rays/s (640x480 over 512^3; limit = gather rate / "
                 "5.8 ideal samples-per-ray)", ray_rate, ideal_rays,
                 ray_rate / ideal_rays))

    print(f"{'op':68s} {'achieved':>12s} {'limit':>12s} {'frac':>6s}")
    for name, got, limit, frac in rows:
        print(f"{name:68s} {got:12.3e} {limit:12.3e} {frac:6.2f}")
    print(json.dumps({"roofline": [
        {"op": n, "achieved": g, "limit": l, "fraction": f}
        for n, g, l, f in rows]}))


if __name__ == "__main__":
    main()
