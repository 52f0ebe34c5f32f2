"""Converter layer: auto-cast inputs to the parent chain's dtype.

Reference: /root/reference/src/refiners/fluxion/layers/converter.py (:6).
Device moves are a no-op under JAX's unified device model; dtype casting
follows the first weighted ancestor's dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion.layers.module import ContextModule


class Converter(ContextModule):
    def __init__(self, set_device: bool = True, set_dtype: bool = True) -> None:
        super().__init__()
        self.set_device = set_device
        self.set_dtype = set_dtype

    def forward(self, *inputs: jax.Array) -> tuple[jax.Array, ...]:
        parent = self.ensure_parent
        dtype = parent.dtype
        if self.set_dtype and dtype is not None:
            return tuple(
                x.astype(dtype) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x for x in inputs
            )
        return inputs
