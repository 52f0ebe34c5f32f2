"""Activation layers.

Reference: /root/reference/src/refiners/fluxion/layers/activations.py (:15-160).
All map to VPU-friendly elementwise XLA ops that fuse into adjacent matmuls.
"""

from __future__ import annotations

from enum import Enum

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion.layers.module import Module


class Activation(Module):
    """Base class for activation layers (activations.py:15)."""


class SiLU(Activation):
    def forward(self, x: jax.Array) -> jax.Array:
        return jax.nn.silu(x)


class ReLU(Activation):
    def forward(self, x: jax.Array) -> jax.Array:
        return jax.nn.relu(x)


class GeLUApproximation(Enum):
    """GeLU approximation modes (activations.py:69)."""

    NONE = "none"
    TANH = "tanh"
    SIGMOID = "sigmoid"


class GeLU(Activation):
    """GeLU with selectable approximation (activations.py:83)."""

    def __init__(self, approximation: GeLUApproximation = GeLUApproximation.NONE) -> None:
        super().__init__()
        self.approximation = approximation

    def forward(self, x: jax.Array) -> jax.Array:
        match self.approximation:
            case GeLUApproximation.NONE:
                return jax.nn.gelu(x, approximate=False)
            case GeLUApproximation.TANH:
                return jax.nn.gelu(x, approximate=True)
            case GeLUApproximation.SIGMOID:
                # "quick gelu": x * sigmoid(1.702 x) — used by CLIP-L
                return x * jax.nn.sigmoid(1.702 * x)


class Sigmoid(Activation):
    def forward(self, x: jax.Array) -> jax.Array:
        return jax.nn.sigmoid(x)


class GLU(Activation):
    """Gated linear unit: split last dim in two, gate with `activation`
    (activations.py:136)."""

    def __init__(self, activation: Activation) -> None:
        super().__init__()
        self.activation = activation

    def forward(self, x: jax.Array) -> jax.Array:
        assert x.shape[-1] % 2 == 0, "Non-batch input dimension must be divisible by 2"
        value, gate = jnp.split(x, 2, axis=-1)
        return value * self.activation(gate)
