"""Pallas TPU kernel for the 1-D parabolic-envelope distance transform.

The EDT's per-axis pass computes ``d[l, q] = min_k (q - k)^2 + f[l, k]``
for every grid line ``l`` (the Felzenszwalb-Huttenlocher transform of
signed_distance_field_generation.cpp:124-226, evaluated as an exact
min-plus reduction — see :mod:`..ops.edt` for why the sequential envelope
scan does not vectorize on TPU).

This kernel is the VMEM-resident formulation: each program pins a
``[n, tile_lines]`` block (lines on lanes, positions on sublanes) in VMEM
and runs the k-reduction on the VPU, accumulating the running minimum in
registers instead of streaming XLA fusion intermediates. The layout is
transposed relative to the XLA twin because Mosaic supports *dynamic
sublane* slices but not dynamic lane slices: ``f[k, :]`` is one sublane
row that broadcasts over the q sublanes for free. Work and results are
identical to :func:`..ops.edt._parabolic_envelope_last`; which backend is
faster is a hardware question (both are VPU-compute-bound), recorded in
BASELINE.md.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_UNROLL = 16


def _launch_envelope(kernel, f: Array, tile_lines: int, tile_q,
                     interpret: bool, with_cmin: bool = False) -> Array:
    """Shared pad/transpose/pallas_call/slice plumbing for the envelope
    kernels (one definition so padding fixes cannot diverge).

    Padding values are load-bearing: the POSITION axis pads with ``+inf``
    (an inf candidate never wins a min), but the LINE axis pads with
    ``0.0`` — an inf-padded lane would pin its outputs at inf, making
    ``max(d)`` over any tile containing it inf and DEFEATING the adaptive
    early exit entirely (the tile degrades to the full O(n^2) sweep;
    measured 13x in interpret mode). Zero-padded lanes converge
    immediately, are exact for their (discarded) outputs, and at worst
    loosen the best-first value bound in the single tile that contains
    them. ``tile_q=None`` selects the full-sweep layout (1-D grid, whole
    lines per program). ``with_cmin=True`` additionally feeds the kernel
    the per-(chunk, line-block) minima ``min f[chunk, block]`` as a second
    input, computed ONCE here in XLA — the in-kernel computation re-reads
    the whole ``[padded_n, tile_lines]`` block in every q-tile program
    (``padded_n / tile_q`` redundant passes, ~13% of the round-5 audited
    per-element budget at 512^3; BASELINE.md EDT roofline accounting)."""
    f = jnp.asarray(f, jnp.float32)
    shape = f.shape
    n = shape[-1]
    lines = int(np.prod(shape[:-1])) if len(shape) > 1 else 1

    # Pad positions to a common multiple of the chunk size and the q tile:
    # a non-multiple pairing would leave padded_n % _UNROLL trailing rows
    # outside n_ch = n // ch, silently dropping real candidates.
    pad_n = (-n) % (_UNROLL if tile_q is None else math.lcm(_UNROLL, tile_q))
    pad_l = (-lines) % tile_lines
    ft = f.reshape(lines, n).T
    if pad_n or pad_l:
        ft = jnp.pad(ft, ((0, pad_n), (0, pad_l)),
                     constant_values=((jnp.inf, jnp.inf), (0.0, 0.0)))
    padded_n, padded_lines = ft.shape

    if tile_q is None:
        grid = (padded_lines // tile_lines,)
        in_spec = pl.BlockSpec((padded_n, tile_lines), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((padded_n, tile_lines), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    else:
        grid = (padded_lines // tile_lines, padded_n // tile_q)
        in_spec = pl.BlockSpec((padded_n, tile_lines), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((tile_q, tile_lines), lambda i, j: (j, i),
                                memory_space=pltpu.VMEM)

    operands = [ft]
    in_specs = [in_spec]
    if with_cmin:
        n_ch = padded_n // _UNROLL
        lb = padded_lines // tile_lines
        cmin = jnp.min(
            ft.reshape(n_ch, _UNROLL, lb, tile_lines), axis=(1, 3))  # [n_ch, lb]
        # Whole [lb, n_ch] array per program (a few KB; Mosaic rejects a
        # (1, n_ch) block — sublane block size must be 8-divisible or the
        # full dim). The kernel slices its line-block row dynamically.
        operands.append(cmin.T)  # [lb, n_ch]: line blocks on sublanes
        in_specs.append(pl.BlockSpec((lb, n_ch), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((padded_n, padded_lines),
                                       jnp.float32, vma=jax.typeof(ft).vma),
        interpret=interpret,
    )(*operands)
    return out[:n, :lines].T.reshape(shape)



def _envelope_kernel(ft_ref, out_ref):
    """out[q, l] = min_k (q - k)^2 + ft[k, l] over the whole line length."""
    n = ft_ref.shape[0]
    # TPU iota is integer-only; q runs down the sublane axis.
    q = lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32)

    def body(kb, d):
        base = (kb * _UNROLL).astype(jnp.float32)
        fk = ft_ref[pl.ds(kb * _UNROLL, _UNROLL), :]  # [_UNROLL, tile_lines]
        for u in range(_UNROLL):
            delta = q - (base + u)
            d = jnp.minimum(d, delta * delta + fk[u:u + 1, :])
        return d

    d0 = jnp.full(out_ref.shape, jnp.inf, dtype=jnp.float32)
    out_ref[:, :] = lax.fori_loop(0, n // _UNROLL, body, d0)


@functools.partial(jax.jit, static_argnames=("tile_lines", "interpret"))
def parabolic_envelope_last_pallas(f: Array, tile_lines: int = 1024,
                                   interpret: bool = False) -> Array:
    """Exact 1-D squared-distance transform along the last axis (Pallas).

    Drop-in twin of :func:`..ops.edt._parabolic_envelope_last`; ``f`` is
    ``[..., n]`` float32 (``+inf`` allowed). ``interpret=True`` runs the
    kernel in the Pallas interpreter so exactness tests run on CPU.
    """
    return _launch_envelope(_envelope_kernel, f, tile_lines, None,
                            interpret)


def squared_edt_pallas(seed: Array, tile_lines: int = 1024,
                       interpret: bool = False) -> Array:
    """3-D squared EDT with Pallas envelope passes (axis 0 uses the same
    binary prefix-scan fast path as the XLA backend — it is exact and
    bandwidth-bound, with nothing for a custom kernel to improve)."""
    from ..ops import edt as edt_ops

    seed = jnp.asarray(seed, dtype=bool)
    d = jnp.moveaxis(
        edt_ops._binary_squared_dist_last(jnp.moveaxis(seed, 0, -1)), -1, 0)
    if seed.shape[1] > 1:
        d = jnp.moveaxis(
            parabolic_envelope_last_pallas(jnp.moveaxis(d, 1, -1),
                                           tile_lines, interpret), -1, 1)
    if seed.shape[2] > 1:
        d = parabolic_envelope_last_pallas(d, tile_lines, interpret)
    return d


def _windowed_kernel(ft_ref, out_ref):
    """Data-adaptive variant: process k sublane-chunks outward from the
    q-tile and stop once the parabola lower bound for every remaining k
    exceeds the tile's current worst distance.

    Exactness: a candidate ``(q-k)^2 + f[k]`` with ``f >= 0`` can only
    improve ``d[q]`` if ``(q-k)^2 < d[q] <= max(d)``; chunks are consumed in
    distance order from the tile, so once ``min_remaining (q-k)^2 >= max(d)``
    over the tile no unprocessed chunk can change any output. Worst case
    (far surfaces) degrades to the full O(n^2) sweep plus bound checks."""
    n = ft_ref.shape[0]
    tq = out_ref.shape[0]
    j = pl.program_id(1)
    q0 = j * tq
    q = (q0 + lax.broadcasted_iota(jnp.int32, (tq, 1), 0)).astype(jnp.float32)
    ch = _UNROLL
    n_ch = n // ch

    def proc_chunk(c, d):
        base = c * ch
        fk = ft_ref[pl.ds(base, ch), :]
        basef = base.astype(jnp.float32)
        for u in range(ch):
            delta = q - (basef + u)
            d = jnp.minimum(d, delta * delta + fk[u:u + 1, :])
        return d

    d0 = jnp.full(out_ref.shape, jnp.inf, dtype=jnp.float32)
    lo0 = q0 // ch
    hi0 = (q0 + tq + ch - 1) // ch
    # Phase 1: the tile's own chunks.
    d = lax.fori_loop(lo0, hi0, proc_chunk, d0)

    # Phase 2: expand outward while any remaining chunk could improve d.
    def cond(state):
        lo, hi, d = state
        more_lo = lo >= 0
        more_hi = hi < n_ch
        # Nearest remaining candidate below sits at k = lo*ch + ch - 1; its
        # closest tile row is q0. Above: k = hi*ch vs row q0 + tq - 1.
        db = (q0 - (lo * ch + ch - 1)).astype(jnp.float32)
        dh = (hi * ch - (q0 + tq - 1)).astype(jnp.float32)
        bound = jnp.minimum(jnp.where(more_lo, db * db, jnp.inf),
                            jnp.where(more_hi, dh * dh, jnp.inf))
        # (bound < inf is already true whenever dmax is inf, and bound is
        # only inf when both sides are exhausted — which the conjunction
        # below also kills — so no special inf handling is needed.)
        can_improve = bound < jnp.max(d)
        return (more_lo | more_hi) & can_improve

    def body(state):
        lo, hi, d = state
        d = lax.cond(lo >= 0, lambda dd: proc_chunk(lo, dd),
                     lambda dd: dd, d)
        d = lax.cond(hi < n_ch, lambda dd: proc_chunk(hi, dd),
                     lambda dd: dd, d)
        return lo - 1, hi + 1, d

    _, _, d = lax.while_loop(cond, body, (lo0 - 1, hi0, d))
    out_ref[:, :] = d


@functools.partial(jax.jit,
                   static_argnames=("tile_lines", "tile_q", "interpret"))
def parabolic_envelope_last_pallas_windowed(
        f: Array, tile_lines: int = 256, tile_q: int = 64,
        interpret: bool = False) -> Array:
    """Exact windowed 1-D squared-distance transform along the last axis.

    Same result as :func:`parabolic_envelope_last_pallas` FOR ``f >= 0``
    (true for every EDT field — squared distances): the geometric-only
    stop bound assumes a candidate can only improve a tile entry from
    within ``(q-k)^2 < max(d)``, which a negative far value would violate.
    Each ``[tile_q, tile_lines]`` output tile consumes k chunks outward
    from the diagonal and early-exits on the parabola bound — O(n *
    window) where the window adapts to the scene's true distances."""
    return _launch_envelope(_windowed_kernel, f, tile_lines, tile_q,
                            interpret)


def _bestfirst_kernel(ft_ref, out_ref):
    """Value-aware best-first variant: chunks are consumed in order of their
    admissible bound ``geom(tile, chunk)^2 + min f[chunk]`` and the march
    stops when the best remaining bound cannot improve the tile's worst
    entry.

    The bound lower-bounds every candidate ``(q-k)^2 + f[k, l]`` with ``k``
    in the chunk and ``q`` in the tile, so stopping at
    ``min_remaining_bound >= max(d)`` is exact. Unlike the distance-ordered
    walk (:func:`_windowed_kernel`), chunks whose values are huge or ``inf``
    (empty space in a binary-seeded EDT) are never processed at all — the
    work per tile adapts to where seeds actually are, not just how far the
    nearest one is."""
    n = ft_ref.shape[0]
    tq = out_ref.shape[0]
    j = pl.program_id(1)
    q0 = j * tq
    q = (q0 + lax.broadcasted_iota(jnp.int32, (tq, 1), 0)).astype(jnp.float32)
    ch = _UNROLL
    n_ch = n // ch

    # Per-chunk minima over the whole [ch, tile_lines] chunk (scalar per
    # chunk; one pass over the block).
    f_all = ft_ref[:, :]
    cmin = jnp.min(f_all.reshape(n_ch, ch * f_all.shape[1]), axis=1,
                   keepdims=True).reshape(1, n_ch)

    # Admissible per-chunk bound: squared distance from the q-tile to the
    # chunk's nearest k, plus the chunk's min value.
    c_idx = lax.broadcasted_iota(jnp.int32, (1, n_ch), 1)
    gap_lo = q0 - (c_idx * ch + ch - 1)
    gap_hi = c_idx * ch - (q0 + tq - 1)
    geom = jnp.maximum(jnp.maximum(gap_lo, gap_hi), 0).astype(jnp.float32)
    bounds = geom * geom + cmin

    def proc_chunk(c, d):
        base = c * ch
        fk = ft_ref[pl.ds(base, ch), :]
        basef = base.astype(jnp.float32)
        for u in range(ch):
            delta = q - (basef + u)
            d = jnp.minimum(d, delta * delta + fk[u:u + 1, :])
        return d

    def cond(state):
        d, b = state
        return jnp.min(b) < jnp.max(d)

    def body(state):
        d, b = state
        c_star = jnp.argmin(b[0]).astype(jnp.int32)
        d = proc_chunk(c_star, d)
        b = jnp.where(c_idx == c_star, jnp.inf, b)
        return d, b

    d0 = jnp.full(out_ref.shape, jnp.inf, dtype=jnp.float32)
    d, _ = lax.while_loop(cond, body, (d0, bounds))
    out_ref[:, :] = d


def _bestfirst_cmin_kernel(ft_ref, cmin_ref, out_ref):
    """:func:`_bestfirst_kernel` with the per-chunk minima HOISTED: the
    launcher computes ``min f[chunk, block]`` once in XLA and feeds it as
    a second input, instead of every q-tile program re-reading the whole
    ``[padded_n, tile_lines]`` block to reduce it (``padded_n / tile_q``
    redundant passes — ~13% of the audited per-element budget at 512^3).
    Chunk-visit order and results are identical."""
    n = ft_ref.shape[0]
    tq = out_ref.shape[0]
    j = pl.program_id(1)
    q0 = j * tq
    q = (q0 + lax.broadcasted_iota(jnp.int32, (tq, 1), 0)).astype(jnp.float32)
    ch = _UNROLL
    n_ch = n // ch

    cmin = cmin_ref[pl.ds(pl.program_id(0), 1), :]  # [1, n_ch]

    c_idx = lax.broadcasted_iota(jnp.int32, (1, n_ch), 1)
    gap_lo = q0 - (c_idx * ch + ch - 1)
    gap_hi = c_idx * ch - (q0 + tq - 1)
    geom = jnp.maximum(jnp.maximum(gap_lo, gap_hi), 0).astype(jnp.float32)
    bounds = geom * geom + cmin

    def proc_chunk(c, d):
        base = c * ch
        fk = ft_ref[pl.ds(base, ch), :]
        basef = base.astype(jnp.float32)
        for u in range(ch):
            delta = q - (basef + u)
            d = jnp.minimum(d, delta * delta + fk[u:u + 1, :])
        return d

    def cond(state):
        d, b = state
        return jnp.min(b) < jnp.max(d)

    def body(state):
        d, b = state
        c_star = jnp.argmin(b[0]).astype(jnp.int32)
        d = proc_chunk(c_star, d)
        b = jnp.where(c_idx == c_star, jnp.inf, b)
        return d, b

    d0 = jnp.full(out_ref.shape, jnp.inf, dtype=jnp.float32)
    d, _ = lax.while_loop(cond, body, (d0, bounds))
    out_ref[:, :] = d


@functools.partial(jax.jit,
                   static_argnames=("tile_lines", "tile_q", "interpret",
                                    "hoist_cmin"))
def parabolic_envelope_last_pallas_bestfirst(
        f: Array, tile_lines: int = 1024, tile_q: int = 32,
        interpret: bool = False, hoist_cmin: bool = True) -> Array:
    """Exact 1-D squared-distance transform, best-first chunk order (see
    :func:`_bestfirst_kernel`). Sign-safe for ANY ``f``: the per-chunk
    bound ``geom^2 + min f[chunk]`` lower-bounds every candidate including
    negative values (unlike the windowed kernel's geometric-only bound).
    ``hoist_cmin`` selects the variant whose per-chunk bound minima are
    precomputed once in XLA (identical results; measured faster — the
    in-kernel reduction re-runs per q-tile, BASELINE.md round-5)."""
    if hoist_cmin:
        return _launch_envelope(_bestfirst_cmin_kernel, f, tile_lines,
                                tile_q, interpret, with_cmin=True)
    return _launch_envelope(_bestfirst_kernel, f, tile_lines, tile_q,
                            interpret)
