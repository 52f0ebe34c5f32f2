"""Linear layers.

Reference: /root/reference/src/refiners/fluxion/layers/linear.py (:9-59).
Weight layout is (in_features, out_features) — the natural `x @ W` layout for
the MXU (no transpose in the hot path); converters transpose torch's (out, in).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion import rng
from refiners_tpu.fluxion.layers.activations import ReLU
from refiners_tpu.fluxion.layers.chain import Chain
from refiners_tpu.fluxion.layers.module import Module, WeightedModule


class Linear(WeightedModule):
    def __init__(
        self,
        in_features: int,
        out_features: int,
        bias: bool = True,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        dtype = dtype or jnp.float32
        bound = 1.0 / math.sqrt(in_features)
        self.weight = rng.init_uniform((in_features, out_features), bound, dtype=dtype)
        self.bias = rng.init_uniform((out_features,), bound, dtype=dtype) if bias else None

    def forward(self, x: jax.Array) -> jax.Array:
        y = jnp.dot(x, self.weight.astype(x.dtype), preferred_element_type=x.dtype)
        if self.bias is not None:
            y = y + self.bias.astype(x.dtype)
        return y


class MultiLinear(Chain):
    """MLP stack: Linear(+ReLU) x num_layers (linear.py:59)."""

    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        inner_dim: int,
        num_layers: int,
        bias: bool = True,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        layers: list[Module] = []
        for i in range(num_layers):
            is_last = i == num_layers - 1
            layers.append(
                Linear(
                    input_dim if i == 0 else inner_dim,
                    output_dim if is_last else inner_dim,
                    bias=bias,
                    device=device,
                    dtype=dtype,
                )
            )
            if not is_last:
                layers.append(ReLU())
        super().__init__(*layers)
