"""Global PRNG stream for parameter initialization and samplers.

The reference relies on torch's implicit global RNG (`manual_seed`,
fluxion/utils.py:20). JAX is explicit-key; we bridge with a module-level
splitting stream so constructors keep reference-compatible signatures
(no `key` argument). `manual_seed(seed)` resets the stream.
"""

from __future__ import annotations

import jax


class _RngStream:
    def __init__(self, seed: int = 0) -> None:
        self._key = jax.random.key(seed)

    def seed(self, seed: int) -> None:
        self._key = jax.random.key(seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub


_stream = _RngStream()


def manual_seed(seed: int) -> None:
    """Seed the global init/sampling stream (reference utils.py:20)."""
    _stream.seed(seed)


def next_key() -> jax.Array:
    return _stream.next()
