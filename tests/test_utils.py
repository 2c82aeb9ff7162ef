"""Tests for the profiling utilities."""

import jax.numpy as jnp

from voxelized_geometry_tools_tpu.utils import PhaseTimer, trace


def test_phase_timer_accumulates():
    timer = PhaseTimer()
    with timer.phase("a"):
        x = jnp.arange(1000.0) * 2.0
    with timer.phase("b", x):
        y = x + 1.0
    with timer.phase("a", y):
        pass
    times = timer.times()
    assert set(times) == {"a", "b"}
    assert times["a"] >= 0.0 and times["b"] >= 0.0
    assert timer.total() == times["a"] + times["b"]
    report = timer.report()
    assert "a:" in report and "total:" in report


def test_trace_noop():
    with trace(None):
        x = jnp.ones(4) + 1.0
    assert float(x[0]) == 2.0


def test_trace_writes(tmp_path):
    with trace(str(tmp_path)):
        (jnp.ones(64) * 3.0).sum()
    assert any(tmp_path.iterdir())
