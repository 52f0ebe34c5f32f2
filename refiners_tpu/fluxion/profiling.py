"""Profiling/debug aids.

The reference's debug surface is the tree printer + located ChainErrors
(SURVEY §5); the TPU-native additions are `jax.profiler` trace capture and a
compiled-timing helper that is robust to async dispatch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/refiners_tpu_trace") -> Iterator[None]:
    """Capture a profiler trace viewable in TensorBoard / Perfetto.

    with profiling.trace("/tmp/trace"):
        out = jitted_fn(...)
        out.block_until_ready()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn: Callable[..., Any], *args: Any, iterations: int = 10, warmup: int = 2) -> float:
    """Median wall-time per call of a jitted function (seconds), forcing
    completion with block_until_ready on every leaf output."""
    times: list[float] = []

    def sync(out: Any) -> None:
        for leaf in jax.tree.leaves(out):
            if isinstance(leaf, jax.Array):
                leaf.block_until_ready()

    for _ in range(warmup):
        sync(fn(*args))
    for _ in range(iterations):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def summarize_memory() -> dict[str, int]:
    """Per-device live buffer bytes."""
    out: dict[str, int] = {}
    for device in jax.devices():
        try:
            stats = device.memory_stats()
            out[str(device)] = int(stats.get("bytes_in_use", 0)) if stats else 0
        except Exception:
            out[str(device)] = -1
    return out
