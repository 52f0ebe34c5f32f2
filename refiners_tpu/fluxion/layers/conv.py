"""Convolution layers (NHWC / HWIO — the TPU-native layout).

Reference: /root/reference/src/refiners/fluxion/layers/conv.py (:6-64).
Weights are stored HWIO so `lax.conv_general_dilated` maps straight onto the
MXU without layout transposes; converters permute torch's OIHW at load time.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion import rng
from refiners_tpu.fluxion.layers.module import WeightedModule

import math


def _pair(v: int | tuple[int, int]) -> tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)  # type: ignore[return-value]


class Conv2d(WeightedModule):
    """2D convolution on NHWC tensors (conv.py:6)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int | tuple[int, int],
        stride: int | tuple[int, int] = (1, 1),
        padding: int | tuple[int, int] | str = (0, 0),
        groups: int = 1,
        use_bias: bool = True,
        dilation: int | tuple[int, int] = (1, 1),
        padding_mode: str = "zeros",
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = padding if isinstance(padding, str) else _pair(padding)
        self.dilation = _pair(dilation)
        self.groups = groups
        self.use_bias = use_bias
        self.padding_mode = padding_mode
        dtype = dtype or jnp.float32
        kh, kw = self.kernel_size
        fan_in = in_channels // groups * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        self.weight = rng.init_uniform((kh, kw, in_channels // groups, out_channels), bound, dtype=dtype)
        self.bias = rng.init_uniform((out_channels,), bound, dtype=dtype) if use_bias else None

    def forward(self, x: jax.Array) -> jax.Array:
        if isinstance(self.padding, str):
            padding: Any = self.padding.upper()
        else:
            ph, pw = self.padding
            padding = [(ph, ph), (pw, pw)]
        y = jax.lax.conv_general_dilated(
            x,
            self.weight.astype(x.dtype),
            window_strides=self.stride,
            padding=padding,
            rhs_dilation=self.dilation,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
        if self.bias is not None:
            y = y + self.bias.astype(x.dtype)
        return y


class ConvTranspose2d(WeightedModule):
    """2D transposed convolution on NHWC tensors (conv.py:64).

    Implemented as an input-dilated convolution with a spatially-flipped
    kernel — the exact gradient-of-conv semantics torch uses, expressed in a
    form XLA tiles well on the MXU.
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int | tuple[int, int],
        stride: int | tuple[int, int] = 1,
        padding: int | tuple[int, int] = 0,
        output_padding: int | tuple[int, int] = 0,
        groups: int = 1,
        use_bias: bool = True,
        dilation: int | tuple[int, int] = 1,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__()
        assert groups == 1, "groups != 1 not supported for ConvTranspose2d"
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.output_padding = _pair(output_padding)
        self.dilation = _pair(dilation)
        self.use_bias = use_bias
        dtype = dtype or jnp.float32
        kh, kw = self.kernel_size
        fan_in = out_channels * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        self.weight = rng.init_uniform((kh, kw, in_channels, out_channels), bound, dtype=dtype)
        self.bias = rng.init_uniform((out_channels,), bound, dtype=dtype) if use_bias else None

    def forward(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        ph, pw = self.padding
        oph, opw = self.output_padding
        dh, dw = self.dilation
        w = jnp.flip(self.weight, axis=(0, 1)).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(1, 1),
            padding=[
                (dh * (kh - 1) - ph, dh * (kh - 1) - ph + oph),
                (dw * (kw - 1) - pw, dw * (kw - 1) - pw + opw),
            ],
            lhs_dilation=self.stride,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
        if self.bias is not None:
            y = y + self.bias.astype(x.dtype)
        return y
