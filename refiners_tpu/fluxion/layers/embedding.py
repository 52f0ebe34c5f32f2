"""Embedding layer.

Reference: /root/reference/src/refiners/fluxion/layers/embedding.py (:7).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion import rng
from refiners_tpu.fluxion.layers.module import WeightedModule


class Embedding(WeightedModule):
    def __init__(self, num_embeddings: int, embedding_dim: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__()
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.weight = rng.init_normal((num_embeddings, embedding_dim), dtype=dtype)

    def forward(self, x: jax.Array) -> jax.Array:
        return jnp.take(self.weight, x, axis=0)
