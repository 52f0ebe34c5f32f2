"""Max pooling layers (NHWC).

Reference: /root/reference/src/refiners/fluxion/layers/maxpool.py (:6/:47).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion.layers.module import Module


class MaxPool1d(Module):
    def __init__(self, kernel_size: int, stride: int | None = None, padding: int = 0) -> None:
        super().__init__()
        self.kernel_size = kernel_size
        self.stride = stride or kernel_size
        self.padding = padding

    def forward(self, x: jax.Array) -> jax.Array:
        # x: (B, L, C) channels-last
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, self.kernel_size, 1),
            window_strides=(1, self.stride, 1),
            padding=((0, 0), (self.padding, self.padding), (0, 0)),
        )


class MaxPool2d(Module):
    def __init__(self, kernel_size: int | tuple[int, int], stride: int | tuple[int, int] | None = None, padding: int = 0) -> None:
        super().__init__()
        ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
        st = ks if stride is None else ((stride, stride) if isinstance(stride, int) else stride)
        self.kernel_size = ks
        self.stride = st
        self.padding = padding

    def forward(self, x: jax.Array) -> jax.Array:
        # x: (B, H, W, C)
        p = self.padding
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, *self.kernel_size, 1),
            window_strides=(1, *self.stride, 1),
            padding=((0, 0), (p, p), (p, p), (0, 0)),
        )
