"""Timestep (range) conditioning.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/range_adapter.py
(compute_sinusoidal_embedding :11, RangeEncoder :25, RangeAdapter2d :47).
The sinusoidal embedding is float32-critical (range_adapter.py:16-17): it is
always computed in f32 and cast down afterwards.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.adapters.adapter import Adapter


def compute_sinusoidal_embedding(x: jax.Array, embedding_dim: int) -> jax.Array:
    """(…,) int timesteps → (…, 1, embedding_dim) f32 embedding [cos | sin]."""
    half_dim = embedding_dim // 2
    exponent = -math.log(10000) * jnp.arange(half_dim, dtype=jnp.float32) / half_dim
    embedding = x[..., None].astype(jnp.float32) * jnp.exp(exponent)[None]
    return jnp.concatenate([jnp.cos(embedding), jnp.sin(embedding)], axis=-1)


class RangeEncoder(fl.Chain):
    """sinusoidal embedding → MLP (range_adapter.py:25)."""

    def __init__(
        self,
        sinusoidal_embedding_dim: int,
        embedding_dim: int,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.sinusoidal_embedding_dim = sinusoidal_embedding_dim
        self.embedding_dim = embedding_dim
        super().__init__(
            fl.Lambda(self.compute_sinusoidal_embedding),
            fl.Converter(set_device=False, set_dtype=True),
            fl.Linear(in_features=sinusoidal_embedding_dim, out_features=embedding_dim, device=device, dtype=dtype),
            fl.SiLU(),
            fl.Linear(in_features=embedding_dim, out_features=embedding_dim, device=device, dtype=dtype),
        )

    def compute_sinusoidal_embedding(self, x: jax.Array) -> jax.Array:
        return compute_sinusoidal_embedding(x, embedding_dim=self.sinusoidal_embedding_dim)


class RangeAdapter2d(fl.Sum, Adapter[fl.Conv2d]):
    """Sum(conv, time-emb→SiLU→Linear→(1,1,C)) on every ResidualBlock first
    conv (range_adapter.py:47); broadcast layout is NHWC."""

    def __init__(
        self,
        target: fl.Conv2d,
        channels: int,
        embedding_dim: int,
        context_key: str,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.channels = channels
        self.embedding_dim = embedding_dim
        with self.setup_adapter(target):
            super().__init__(
                target,
                fl.Chain(
                    fl.UseContext("range_adapter", context_key),
                    fl.SiLU(),
                    fl.Linear(in_features=embedding_dim, out_features=channels, device=device, dtype=dtype),
                    fl.Reshape(1, 1, channels),
                ),
            )

    @property
    def context_key(self) -> str:
        use_context_module = self.ensure_find(fl.UseContext)
        assert use_context_module.context == "range_adapter"
        return use_context_module.key

    @context_key.setter
    def context_key(self, value: str) -> None:
        use_context_module = self.ensure_find(fl.UseContext)
        assert use_context_module.context == "range_adapter"
        use_context_module.key = value
