"""Profiling / tracing utilities.

The reference's only observability hooks are the per-phase wall timings it
returns from API calls (``VoxelizerRuntime`` — pointcloud_voxelization_
interface.hpp:206-229) and ``std::chrono`` prints in the examples
(tutorial.cpp:145-155, 213-219). This module keeps that "runtime struct
returned from the API" shape (see :class:`..ops.voxelize.VoxelizerRuntime`)
and adds the TPU-native equivalents:

* :class:`PhaseTimer` — named wall-clock phases with forced device
  materialization, so timings are correct even where ``block_until_ready``
  is unreliable (tunneled TPU runtimes),
* :func:`trace` — a thin wrapper over ``jax.profiler.trace`` producing
  TensorBoard-loadable device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np


def force_materialize(*values) -> None:
    """Block until every array in ``values`` is fully computed by reading one
    scalar from each device buffer (a D2H read cannot complete before the
    producing computation does; ``block_until_ready`` can return early on
    tunneled backends).

    Tracers (calls from inside a jitted computation) are skipped — there is
    no device buffer to wait on at trace time, and the read would raise.
    Multi-device note: the scalar lives on ONE shard; XLA inserts the
    cross-device dependencies of jitted sharded outputs, but for manually
    placed per-device buffers, materialize one element of EACH shard.
    """
    import jax
    from jax import core as jax_core
    sliced = []
    for v in values:
        for leaf in jax.tree_util.tree_leaves(v):
            if isinstance(leaf, jax_core.Tracer):
                continue
            if hasattr(leaf, "ndim") and getattr(leaf, "size", 0) > 0:
                # Slice ONE element on-device (4-byte D2H); np.asarray(full
                # array) would ship the whole buffer over the wire on
                # tunneled runtimes. Zero-size leaves have nothing to wait
                # on (and would raise on indexing).
                sliced.append(leaf[(0,) * leaf.ndim])
    # Dispatch all slices first, then read: N leaves cost ~one host-device
    # round trip instead of N sequential ones on high-latency tunnels.
    for s in sliced:
        np.asarray(s)


class PhaseTimer:
    """Accumulating named-phase wall timer.

    The context manager yields a list; append the block's OUTPUTS to it so
    they are materialized before the clock stops (arguments passed to
    ``phase(...)`` directly are bound at entry and therefore can only be
    values that already exist — an earlier design bound ONLY entry-time
    arguments, which by construction could never cover the timed block's
    own results, so async dispatch leaked each phase's device time into
    the next phase).

    >>> timer = PhaseTimer()
    >>> with timer.phase("raycast") as outs:
    ...     grids = carve(...)
    ...     outs.append(grids)        # materialized before the clock stops
    >>> timer.times()["raycast"]

    A phase whose body raises records no time (a half-timed failed phase
    would pollute the totals) and never masks the body's exception with a
    secondary materialization error.
    """

    def __init__(self):
        self._times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, *materialize):
        outs = list(materialize)
        t0 = time.monotonic()
        yield outs
        # (reached only when the body did not raise)
        force_materialize(*outs)
        self._times[name] = (self._times.get(name, 0.0)
                             + time.monotonic() - t0)

    def times(self) -> Dict[str, float]:
        return dict(self._times)

    def total(self) -> float:
        return sum(self._times.values())

    def report(self) -> str:
        lines = [f"{name}: {t:.4f}s" for name, t in self._times.items()]
        lines.append(f"total: {self.total():.4f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Device-level profiler trace (TensorBoard format). No-op when
    ``log_dir`` is None so call sites can leave tracing wired in."""
    if log_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
