"""Padding layers (NHWC).

Reference: /root/reference/src/refiners/fluxion/layers/padding.py (:6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion.layers.module import Module


class ReflectionPad2d(Module):
    def __init__(self, padding: int) -> None:
        super().__init__()
        self.padding = padding

    def forward(self, x: jax.Array) -> jax.Array:
        p = self.padding
        return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
