"""Spatial up/downsampling layers (NHWC).

Reference: /root/reference/src/refiners/fluxion/layers/sampling.py
(Interpolate :13, Downsample :41, Upsample :112). Shapes registered in the
"sampling" context are static Python tuples at trace time, so the
shape-matching UNet skip pathway compiles to fixed-size resizes.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion.layers.basics import Identity
from refiners_tpu.fluxion.layers.chain import Chain, Lambda, Parallel, SetContext, UseContext
from refiners_tpu.fluxion.layers.conv import Conv2d
from refiners_tpu.fluxion.layers.module import Module


class Interpolate(Module):
    """Resize an NHWC tensor to a target spatial shape (sampling.py:13)."""

    def __init__(self, mode: str = "nearest", antialias: bool = False) -> None:
        super().__init__()
        self.mode = mode
        self.antialias = antialias

    def forward(self, x: jax.Array, shape: tuple[int, int]) -> jax.Array:
        from refiners_tpu.fluxion.utils import interpolate

        return interpolate(x, size=tuple(shape), mode=self.mode, antialias=self.antialias)


class Downsample(Chain):
    """Strided-conv downsample by `scale_factor` (sampling.py:41)."""

    def __init__(
        self,
        channels: int,
        scale_factor: int,
        padding: int = 0,
        register_shape: bool = True,
        device: Any = None,
        dtype: Any = None,
    ):
        self.channels = channels
        self.in_channels = channels
        self.out_channels = channels
        self.scale_factor = scale_factor
        self.padding = padding
        super().__init__(
            Conv2d(
                in_channels=channels,
                out_channels=channels,
                kernel_size=3,
                stride=scale_factor,
                padding=padding,
                device=device,
                dtype=dtype,
            ),
        )
        if padding == 0:
            # SD VAE asymmetric pad: right/bottom only
            zero_pad: Callable[[jax.Array], jax.Array] = lambda x: jnp.pad(
                x, ((0, 0), (0, 1), (0, 1), (0, 0))
            )
            self.insert(index=0, module=Lambda(func=zero_pad))
        if register_shape:
            self.insert(index=0, module=SetContext(context="sampling", key="shapes", callback=self.register_shape))

    def register_shape(self, shapes: list[tuple[int, int]], x: jax.Array) -> None:
        shapes.append(x.shape[1:3])


class Upsample(Chain):
    """Nearest-upsample (to context shape or ×factor) then 3×3 conv (sampling.py:112)."""

    def __init__(
        self,
        channels: int,
        upsample_factor: int | None = None,
        device: Any = None,
        dtype: Any = None,
    ):
        self.channels = channels
        self.upsample_factor = upsample_factor
        super().__init__(
            Parallel(
                Identity(),
                (
                    Lambda(self._get_static_shape)
                    if upsample_factor is not None
                    else UseContext(context="sampling", key="shapes").compose(lambda x: x.pop())
                ),
            ),
            Interpolate(),
            Conv2d(in_channels=channels, out_channels=channels, kernel_size=3, padding=1, device=device, dtype=dtype),
        )

    def _get_static_shape(self, x: jax.Array) -> tuple[int, int]:
        assert self.upsample_factor is not None
        return tuple(size * self.upsample_factor for size in x.shape[1:3])
