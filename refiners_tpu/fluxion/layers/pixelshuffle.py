"""PixelUnshuffle (NHWC space-to-depth).

Reference: /root/reference/src/refiners/fluxion/layers/pixelshuffle.py (:6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion.layers.module import Module


class PixelUnshuffle(Module):
    """(B, H·r, W·r, C) → (B, H, W, C·r²), matching torch's channel ordering
    (C-major: out channel index = c·r² + dy·r + dx)."""

    def __init__(self, downscale_factor: int) -> None:
        super().__init__()
        self.downscale_factor = downscale_factor

    def forward(self, x: jax.Array) -> jax.Array:
        r = self.downscale_factor
        b, h, w, c = x.shape
        x = x.reshape(b, h // r, r, w // r, r, c)
        x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h/r, w/r, c, dy, dx
        return x.reshape(b, h // r, w // r, c * r * r)


class PixelShuffle(Module):
    """(B, H, W, C·r²) → (B, H·r, W·r, C), inverse of PixelUnshuffle."""

    def __init__(self, upscale_factor: int) -> None:
        super().__init__()
        self.upscale_factor = upscale_factor

    def forward(self, x: jax.Array) -> jax.Array:
        r = self.upscale_factor
        b, h, w, crr = x.shape
        c = crr // (r * r)
        x = x.reshape(b, h, w, c, r, r)
        x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, dy, w, dx, c
        return x.reshape(b, h * r, w * r, c)
