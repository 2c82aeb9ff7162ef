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
from typing import Dict, List, Optional, Tuple

import numpy as np


def force_materialize(*values) -> None:
    """Block until every array in ``values`` is fully computed by reading one
    scalar from each device buffer (a D2H read cannot complete before the
    producing computation does; ``block_until_ready`` can return early on
    tunneled backends)."""
    import jax
    for v in values:
        for leaf in jax.tree_util.tree_leaves(v):
            if hasattr(leaf, "ndim") and getattr(leaf, "size", 0) > 0:
                # Slice ONE element on-device, then read it (4-byte D2H);
                # np.asarray(full array) would ship the whole buffer over
                # the wire on tunneled runtimes. Zero-size leaves have
                # nothing to wait on (and would raise on indexing).
                np.asarray(leaf[(0,) * leaf.ndim])


class PhaseTimer:
    """Accumulating named-phase wall timer.

    >>> timer = PhaseTimer()
    >>> with timer.phase("raycast"):
    ...     grids = carve(...)        # timed, materialized on exit
    >>> timer.times()["raycast"]
    """

    def __init__(self):
        self._times: Dict[str, float] = {}
        self._order: List[str] = []

    @contextlib.contextmanager
    def phase(self, name: str, *materialize):
        t0 = time.monotonic()
        try:
            yield
        finally:
            force_materialize(*materialize)
            dt = time.monotonic() - t0
            if name not in self._times:
                self._order.append(name)
                self._times[name] = 0.0
            self._times[name] += dt

    def times(self) -> Dict[str, float]:
        return dict(self._times)

    def total(self) -> float:
        return sum(self._times.values())

    def report(self) -> str:
        lines = [f"{name}: {self._times[name]:.4f}s" for name in self._order]
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
