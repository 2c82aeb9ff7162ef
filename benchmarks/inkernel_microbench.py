"""Primitive-rate microbenchmarks for in-kernel (Pallas) march and carve.

The round-2 review asks for a serious in-kernel attempt at (a) the sphere-
trace march (ray state in VMEM, corner-row gathers issued in-kernel,
cuda_voxelization_helpers.cu:73-356 keeps its hot loop in one kernel) and
(b) the carve with VMEM tile-private accumulators (SURVEY.md section 7
stage 4). Both designs stand or fall on the rate of ONE primitive each:

* march: a data-dependent row fetch at a per-ray dynamic index. Pallas TPU
  has no vector gather — from VMEM the only form is a *dynamic sublane
  slice* (``ref[pl.ds(i, 1), :]``) issued by the scalar core, one per ray
  per step; from HBM it is one DMA per row.
* carve: a masked row accumulate at a per-run dynamic index
  (``acc[pl.ds(row, 1), :] += mask``), one per column run.

This file measures those primitive rates directly (plus the HBM-DMA
variant at several pipeline depths), so the design decision — and the
BASELINE.md record — rests on hardware numbers rather than estimates. The
comparison targets (measured, BASELINE.md): XLA gather 9.3-13.2 ns/row;
XLA scatter-add ~10 ns per 512-byte row.

Run on the real chip: ``python benchmarks/inkernel_microbench.py``.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable from anywhere

import functools
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# LCG constants (Numerical Recipes) for in-kernel index generation: the
# scalar core derives the next row index in a few cycles, so the measured
# per-iteration cost is the memory primitive, not index bookkeeping.
_LCG_A = 1664525
_LCG_C = 1013904223


def _force(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def _timeit(fn, *args, iters=10):
    out = fn(*args)
    _force(out)
    t0 = time.monotonic()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.monotonic() - t0) / iters


# --- 1. VMEM dynamic-sublane row gather (the march primitive) -------------


def _vmem_gather_kernel(table_ref, out_ref, *, n_iters, n_rows):
    def body(i, carry):
        seed, acc = carry
        seed = seed * _LCG_A + _LCG_C
        idx = lax.rem(lax.abs(seed), n_rows)
        row = table_ref[pl.ds(idx, 1), :]
        return seed, acc + row

    acc0 = jnp.zeros(out_ref.shape, jnp.float32)
    _, acc = lax.fori_loop(0, n_iters, body, (jnp.int32(12345), acc0))
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("n_iters", "n_rows", "width"))
def vmem_gather_bench(table, n_iters, n_rows, width):
    return pl.pallas_call(
        functools.partial(_vmem_gather_kernel, n_iters=n_iters,
                          n_rows=n_rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, width), jnp.float32),
    )(table)


# --- 2. VMEM dynamic-sublane row accumulate (the carve primitive) ---------


def _vmem_scatter_kernel(mask_ref, acc_ref, *, n_iters, n_rows):
    acc_ref[:, :] = jnp.zeros(acc_ref.shape, jnp.float32)

    def body(i, seed):
        seed = seed * _LCG_A + _LCG_C
        idx = lax.rem(lax.abs(seed), n_rows)
        acc_ref[pl.ds(idx, 1), :] += mask_ref[:, :]
        return seed

    lax.fori_loop(0, n_iters, body, jnp.int32(54321))


@functools.partial(jax.jit, static_argnames=("n_iters", "n_rows", "width"))
def vmem_scatter_bench(mask, n_iters, n_rows, width):
    return pl.pallas_call(
        functools.partial(_vmem_scatter_kernel, n_iters=n_iters,
                          n_rows=n_rows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, width), jnp.float32),
    )(mask)


# --- 3. HBM row DMA at pipeline depth S (the alternative march gather) ----


def _hbm_dma_kernel(table_ref, out_ref, scratch, sems, *, n_iters, n_rows,
                    depth):
    def start(slot, seed):
        seed = seed * _LCG_A + _LCG_C
        idx = lax.rem(lax.abs(seed), n_rows)
        pltpu.make_async_copy(table_ref.at[pl.ds(idx, 1), :],
                              scratch.at[pl.ds(slot, 1), :],
                              sems.at[slot]).start()
        return seed

    # Warm the pipeline with `depth` outstanding row DMAs, then retire one
    # and issue the next each iteration.
    seed = jnp.int32(99991)
    for s in range(depth):
        seed = start(s, seed)

    def body(i, carry):
        seed, acc = carry
        slot = lax.rem(i, depth)
        pltpu.make_async_copy(table_ref.at[pl.ds(0, 1), :],
                              scratch.at[pl.ds(slot, 1), :],
                              sems.at[slot]).wait()
        acc = acc + scratch[pl.ds(slot, 1), :]
        seed = start(slot, seed)
        return seed, acc

    acc0 = jnp.zeros(out_ref.shape, jnp.float32)
    _, acc = lax.fori_loop(0, n_iters - depth, body, (seed, acc0))
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("n_iters", "n_rows", "width",
                                             "depth"))
def hbm_dma_bench(table, n_iters, n_rows, width, depth):
    return pl.pallas_call(
        functools.partial(_hbm_dma_kernel, n_iters=n_iters, n_rows=n_rows,
                          depth=depth),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((depth, width), jnp.float32),
                        pltpu.SemaphoreType.DMA((depth,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(table)


# --- 4. Vectorized march step: W rays per scalar-gather batch -------------


def _vmem_batch_march_kernel(table_ref, t_ref, out_ref, rows_scratch, *,
                             n_steps, n_rows, batch):
    """March-shaped loop: per step, gather `batch` rows by dynamic sublane
    loads into a scratch tile, then one vectorized combine updates all ray
    states — measures the amortized per-ray step cost of the real design
    (gather loop + vector trilinear/update)."""
    t = t_ref[:, :]

    def step(s, carry):
        t, seed = carry

        def gather_one(j, seed):
            seed = seed * _LCG_A + _LCG_C
            idx = lax.rem(lax.abs(seed), n_rows)
            rows_scratch[pl.ds(j, 1), :] = table_ref[pl.ds(idx, 1), :]
            return seed

        seed = lax.fori_loop(0, batch, gather_one, seed)
        rows = rows_scratch[:, :]
        # Stand-in for trilinear + t update: a weighted lane reduction.
        d = jnp.sum(rows * 0.125, axis=1, keepdims=True).T  # [1, batch]
        t = t + jnp.maximum(d, 0.001)
        return t, seed

    t, _ = lax.fori_loop(0, n_steps, step, (t, jnp.int32(777)))
    out_ref[:, :] = t


@functools.partial(jax.jit, static_argnames=("n_steps", "n_rows", "width",
                                             "batch"))
def vmem_batch_march_bench(table, t0, n_steps, n_rows, width, batch):
    return pl.pallas_call(
        functools.partial(_vmem_batch_march_kernel, n_steps=n_steps,
                          n_rows=n_rows, batch=batch),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, batch), jnp.float32),
        scratch_shapes=[pltpu.VMEM((batch, width), jnp.float32)],
    )(table, t0)


def main():
    rng = np.random.default_rng(0)
    results = {}

    # March-relevant shape: corner rows are 8 f32 wide (padded to 128 lanes
    # in VMEM — lane padding is free for the issue-bound loop); brick of
    # 4096 rows = 2 MB.
    n_rows, width = 4096, 128
    table = jnp.asarray(rng.standard_normal((n_rows, width)), jnp.float32)

    for n_iters in (100_000,):
        t = _timeit(vmem_gather_bench, table, n_iters, n_rows, width)
        results["vmem_gather_ns_per_row"] = t / n_iters * 1e9
        print(f"VMEM dyn-sublane gather: {t / n_iters * 1e9:.1f} ns/row "
              f"({n_iters} rows, {n_rows}x{width} table)")

    mask = jnp.ones((1, width), jnp.float32)
    for acc_rows in (2048, 8192):
        t = _timeit(lambda m: vmem_scatter_bench(m, 100_000, acc_rows,
                                                 width), mask)
        results[f"vmem_scatter_ns_per_row_{acc_rows}"] = t / 100_000 * 1e9
        print(f"VMEM dyn-sublane row += (acc {acc_rows}x{width}): "
              f"{t / 100_000 * 1e9:.1f} ns/row")

    big_table = jnp.asarray(rng.standard_normal((1 << 20, width)),
                            jnp.float32)
    for depth in (2, 8, 16):
        t = _timeit(lambda tb: hbm_dma_bench(tb, 20_000, 1 << 20, width,
                                             depth), big_table)
        results[f"hbm_dma_ns_per_row_depth{depth}"] = t / 20_000 * 1e9
        print(f"HBM row DMA (depth {depth}): {t / 20_000 * 1e9:.1f} ns/row")

    for batch in (64, 256):
        tt0 = jnp.zeros((1, batch), jnp.float32)
        t = _timeit(lambda tb, z: vmem_batch_march_bench(
            tb, z, 64, n_rows, width, batch), table, tt0)
        per_ray_step = t / (64 * batch) * 1e9
        results[f"march_step_ns_per_ray_batch{batch}"] = per_ray_step
        print(f"batched march step (batch {batch}): "
              f"{per_ray_step:.1f} ns/ray/step")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
