"""Normalization layers (channels-last convention).

Reference: /root/reference/src/refiners/fluxion/layers/norm.py (:14-154).
Spatial tensors are NHWC here (TPU-native layout), so "2d" norms normalize the
trailing channel axis; statistics accumulate in float32 for bf16 inputs.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion.layers.module import Module, WeightedModule


def _stats(x: jax.Array, axes: tuple[int, ...]) -> tuple[jax.Array, jax.Array]:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.var(x32, axis=axes, keepdims=True)
    return mean, var


class LayerNorm(WeightedModule):
    """LayerNorm over the trailing dims (norm.py:14)."""

    def __init__(
        self, normalized_shape: int | tuple[int, ...], eps: float = 1e-5, device: Any = None, dtype: Any = None
    ) -> None:
        super().__init__()
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.eps = eps
        self.weight = jnp.ones(self.normalized_shape, dtype=dtype or jnp.float32)
        self.bias = jnp.zeros(self.normalized_shape, dtype=dtype or jnp.float32)

    def forward(self, x: jax.Array) -> jax.Array:
        axes = tuple(range(x.ndim - len(self.normalized_shape), x.ndim))
        mean, var = _stats(x, axes)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * self.weight.astype(jnp.float32) + self.bias.astype(jnp.float32)).astype(x.dtype)


class GroupNorm(WeightedModule):
    """GroupNorm on NHWC/N...C tensors: channels are the LAST axis (norm.py:52)."""

    def __init__(
        self, channels: int, num_groups: int, eps: float = 1e-5, device: Any = None, dtype: Any = None
    ) -> None:
        super().__init__()
        assert channels % num_groups == 0, "Number of channels must be divisible by number of groups"
        self.channels = channels
        self.num_groups = num_groups
        self.eps = eps
        self.weight = jnp.ones((channels,), dtype=dtype or jnp.float32)
        self.bias = jnp.zeros((channels,), dtype=dtype or jnp.float32)

    def forward(self, x: jax.Array) -> jax.Array:
        b = x.shape[0]
        spatial = x.shape[1:-1]
        g = self.num_groups
        xg = x.reshape(b, *spatial, g, self.channels // g)
        axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        mean, var = _stats(xg, axes)
        y = (xg.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y.reshape(x.shape)
        return (y * self.weight.astype(jnp.float32) + self.bias.astype(jnp.float32)).astype(x.dtype)


class LayerNorm2d(WeightedModule):
    """Per-channel affine LayerNorm over the channel axis of NHWC (norm.py:95).

    The reference normalizes dim=1 of NCHW; with channels last this is a
    LayerNorm over the trailing axis with per-channel affine.
    """

    def __init__(self, channels: int, eps: float = 1e-6, device: Any = None, dtype: Any = None) -> None:
        super().__init__()
        self.channels = channels
        self.eps = eps
        self.weight = jnp.ones((channels,), dtype=dtype or jnp.float32)
        self.bias = jnp.zeros((channels,), dtype=dtype or jnp.float32)

    def forward(self, x: jax.Array) -> jax.Array:
        mean, var = _stats(x, (x.ndim - 1,))
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * self.weight.astype(jnp.float32) + self.bias.astype(jnp.float32)).astype(x.dtype)


class InstanceNorm2d(Module):
    """Instance norm over spatial dims of NHWC, no affine (norm.py:130)."""

    def __init__(self, channels: int, eps: float = 1e-05, device: Any = None, dtype: Any = None) -> None:
        super().__init__()
        self.channels = channels
        self.eps = eps

    def forward(self, x: jax.Array) -> jax.Array:
        axes = tuple(range(1, x.ndim - 1))
        mean, var = _stats(x, axes)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return y.astype(x.dtype)
