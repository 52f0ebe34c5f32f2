"""Global PRNG stream for parameter initialization and samplers.

The reference relies on torch's implicit global RNG (`manual_seed`,
fluxion/utils.py:20). JAX is explicit-key; we bridge with a module-level
splitting stream so constructors keep reference-compatible signatures
(no `key` argument). `manual_seed(seed)` resets the stream.
"""

from __future__ import annotations

import jax
import numpy as np


class _RngStream:
    def __init__(self, seed: int = 0) -> None:
        self.seed(seed)

    def seed(self, seed: int) -> None:
        self._key = jax.random.key(seed)
        self._np = np.random.default_rng(seed)

    def next(self) -> jax.Array:
        new_key, sub = jax.random.split(self._key)
        if isinstance(new_key, jax.core.Tracer):
            # called during tracing: do NOT store the tracer into global
            # state (it would leak); the traced subkey is a per-compilation
            # constant — pass an explicit `key` for varying randomness in jit
            return sub
        self._key = new_key
        return sub


_stream = _RngStream()


def manual_seed(seed: int) -> None:
    """Seed the global init/sampling stream (reference utils.py:20)."""
    _stream.seed(seed)


def next_key() -> jax.Array:
    return _stream.next()


def init_uniform(shape: tuple[int, ...], bound: float, dtype=None) -> jax.Array:
    """Host-side numpy init (U(-bound, bound)): ~100× faster than per-layer
    device RNG when constructing large models."""
    import jax.numpy as jnp

    arr = _stream._np.uniform(-bound, bound, size=shape).astype(np.float32)
    return jnp.asarray(arr, dtype=dtype or jnp.float32)


def init_normal(shape: tuple[int, ...], std: float = 1.0, dtype=None) -> jax.Array:
    import jax.numpy as jnp

    arr = (_stream._np.standard_normal(size=shape) * std).astype(np.float32)
    return jnp.asarray(arr, dtype=dtype or jnp.float32)
