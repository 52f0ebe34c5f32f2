"""Profiling/debug helpers (trace capture, async-safe benchmark, memory summary)."""

from pathlib import Path

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion import profiling


def test_benchmark_returns_positive_median() -> None:
    fn = jax.jit(lambda x: jnp.sin(x) @ jnp.cos(x).T)
    x = jnp.ones((64, 64))
    dt = profiling.benchmark(fn, x, iterations=4, warmup=1)
    assert isinstance(dt, float) and dt > 0


def test_trace_writes_profile_dir(tmp_path: Path) -> None:
    log_dir = tmp_path / "trace"
    with profiling.trace(str(log_dir)):
        y = jax.jit(lambda x: x * 2)(jnp.ones((8, 8)))
        y.block_until_ready()
    written = list(log_dir.rglob("*"))
    assert written, "profiler trace produced no files"


def test_summarize_memory_reports_every_device() -> None:
    # CPU (and tunneled) backends may report 0 live bytes; the contract is
    # one integer entry per device, never an exception
    summary = profiling.summarize_memory()
    assert set(summary) == {str(d) for d in jax.devices()}
    assert all(isinstance(v, int) for v in summary.values())
