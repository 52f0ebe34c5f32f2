"""Shared CLIP blocks.

Reference: /root/reference/src/refiners/foundationals/clip/common.py
(PositionalEncoder :7, FeedForward :35).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl


class PositionalEncoder(fl.Chain):
    """arange position ids → Embedding (common.py:7)."""

    def __init__(
        self, max_sequence_length: int, embedding_dim: int, device: Any = None, dtype: Any = None
    ) -> None:
        self.max_sequence_length = max_sequence_length
        self.embedding_dim = embedding_dim
        super().__init__(
            fl.Lambda(func=self.get_position_ids),
            fl.Embedding(
                num_embeddings=max_sequence_length, embedding_dim=embedding_dim, device=device, dtype=dtype
            ),
        )

    @property
    def position_ids(self) -> jax.Array:
        return jnp.arange(self.max_sequence_length, dtype=jnp.int32).reshape(1, -1)

    def get_position_ids(self, x: jax.Array) -> jax.Array:
        return self.position_ids[:, : x.shape[1]]


class FeedForward(fl.Chain):
    """Linear → GeLU → Linear (common.py:35)."""

    def __init__(self, embedding_dim: int, feedforward_dim: int, device: Any = None, dtype: Any = None) -> None:
        self.embedding_dim = embedding_dim
        self.feedforward_dim = feedforward_dim
        super().__init__(
            fl.Linear(in_features=embedding_dim, out_features=feedforward_dim, device=device, dtype=dtype),
            fl.GeLU(),
            fl.Linear(in_features=feedforward_dim, out_features=embedding_dim, device=device, dtype=dtype),
        )
