"""SAM prompt encoders (points / boxes / masks).

Reference: /root/reference/src/refiners/foundationals/segment_anything/prompt_encoder.py
(CoordinateEncoder :13, PointTypeEmbedding :40, PointEncoder :57, MaskEncoder :145).
NHWC: dense embeddings are (B, H, W, C).
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from enum import Enum, auto
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion import rng
from refiners_tpu.fluxion.context import Contexts


class CoordinateEncoder(fl.Chain):
    """Random-Fourier coordinate features (prompt_encoder.py:13)."""

    def __init__(
        self,
        num_positional_features: int = 64,
        scale: float = 1,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.num_positional_features = num_positional_features
        self.scale = scale
        super().__init__(
            fl.Multiply(scale=2, bias=-1),
            fl.Linear(in_features=2, out_features=num_positional_features, bias=False, device=device, dtype=dtype),
            fl.Multiply(scale=2 * math.pi * self.scale),
            fl.Concatenate(fl.Sin(), fl.Cos(), dim=-1),
        )


class PointType(Enum):
    BACKGROUND = auto()
    FOREGROUND = auto()
    BOX_TOP_LEFT = auto()
    BOX_BOTTOM_RIGHT = auto()
    NOT_A_POINT = auto()


class PointTypeEmbedding(fl.WeightedModule, fl.ContextModule):
    """Per-point-type embeddings selected by the type mask (prompt_encoder.py:40)."""

    def __init__(self, embedding_dim: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__()
        self.embedding_dim = embedding_dim
        self.weight = rng.init_normal((len(PointType), embedding_dim), dtype=dtype)

    def forward(self, type_mask: jax.Array) -> jax.Array:
        # type ids are 1-based; id 0 (unused) maps to zeros like the reference
        valid = type_mask > 0
        idx = jnp.clip(type_mask - 1, 0, len(PointType) - 1)
        emb = jnp.take(self.weight, idx, axis=0)
        return jnp.where(valid[..., None], emb, 0.0)


class PadPoints(fl.ContextModule):
    """Append a NOT_A_POINT pad token when no boxes are present.

    A proper module, NOT a bound-method Lambda: under jit the pytree is
    unflattened into fresh instances, and a bound method would keep reading
    the ORIGINAL instance's (empty) context provider. The padding decision
    branches on the type-mask VALUES on the host, so the mask must be a
    concrete (trace-time constant) array — see model._decode_masks.
    """

    def forward(self, x: jax.Array) -> jax.Array:
        context = self.use_context("point_encoder")
        type_mask: jax.Array = context["type_mask"]
        has_box = bool(
            np.any(
                (np.asarray(type_mask) == PointType.BOX_TOP_LEFT.value)
                | (np.asarray(type_mask) == PointType.BOX_BOTTOM_RIGHT.value)
            )
        )
        if has_box:
            return x
        pad_ids = jnp.full((type_mask.shape[0], 1), PointType.NOT_A_POINT.value, dtype=type_mask.dtype)
        # write through the parent CHAIN so the update cascades into sibling
        # sub-chains' providers (each holds its own copy of this context —
        # a plain provider write would leave the Residual's stale)
        parent = self.parent
        assert isinstance(parent, fl.Chain)
        parent.set_context("point_encoder", {"type_mask": jnp.concatenate([type_mask, pad_ids], axis=1)})
        return jnp.concatenate([x, jnp.zeros((x.shape[0], 1, x.shape[-1]), dtype=x.dtype)], axis=1)


class PointEncoder(fl.Chain):
    def __init__(self, embedding_dim: int = 256, scale: float = 1, device: Any = None, dtype: Any = None) -> None:
        assert embedding_dim % 2 == 0, "embedding_dim must be divisible by 2."
        self.embedding_dim = embedding_dim
        self.scale = scale
        super().__init__(
            CoordinateEncoder(num_positional_features=embedding_dim // 2, scale=scale, device=device, dtype=dtype),
            PadPoints(),
            fl.Residual(
                fl.UseContext(context="point_encoder", key="type_mask"),
                PointTypeEmbedding(embedding_dim=embedding_dim, device=device, dtype=dtype),
            ),
        )

    def init_context(self) -> Contexts:
        return {"point_encoder": {"type_mask": None}}

    def set_type_mask(self, type_mask: jax.Array) -> None:
        self.set_context("point_encoder", {"type_mask": type_mask})

    def get_dense_positional_embedding(self, image_embedding_size: tuple[int, int]) -> jax.Array:
        """(1, H, W, C) dense positional embedding grid (prompt_encoder.py:98)."""
        coordinate_encoder = self.ensure_find(CoordinateEncoder)
        height, width = image_embedding_size
        grid = jnp.ones((height, width), dtype=jnp.float32)
        y_embedding = (jnp.cumsum(grid, axis=0) - 0.5) / height
        x_embedding = (jnp.cumsum(grid, axis=1) - 0.5) / width
        return coordinate_encoder(jnp.stack([x_embedding, y_embedding], axis=-1))[None]

    def points_to_tensor(
        self,
        foreground_points: Sequence[tuple[float, float]] | None = None,
        background_points: Sequence[tuple[float, float]] | None = None,
        not_a_points: Sequence[tuple[float, float]] | None = None,
        box_points: Sequence[Sequence[tuple[float, float]]] | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Pack prompt points into (coords, type_mask) (prompt_encoder.py:115)."""
        foreground_points = foreground_points or []
        background_points = background_points or []
        not_a_points = not_a_points or []
        box_points = box_points or []
        top_left_points = [box[0] for box in box_points]
        bottom_right_points = [box[1] for box in box_points]

        coordinates: list[np.ndarray] = []
        type_ids: list[np.ndarray] = []
        # must be in sync with the PointType enum ordering
        for type_id, coords_seq in zip(
            PointType, [background_points, foreground_points, top_left_points, bottom_right_points, not_a_points]
        ):
            if len(coords_seq) > 0:
                coordinates.append(np.asarray(list(coords_seq), dtype=np.float32))
                type_ids.append(np.full((len(coords_seq),), type_id.value, dtype=np.int32))

        all_coordinates = jnp.asarray(np.concatenate(coordinates, axis=0))[None]
        type_mask = jnp.asarray(np.concatenate(type_ids, axis=0))[None]
        return all_coordinates, type_mask


class MaskEncoder(fl.Chain):
    def __init__(
        self,
        embedding_dim: int = 256,
        intermediate_channels: int = 16,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.embedding_dim = embedding_dim
        self.intermediate_channels = intermediate_channels
        super().__init__(
            fl.Conv2d(
                in_channels=1, out_channels=intermediate_channels // 4, kernel_size=2, stride=2, device=device, dtype=dtype
            ),
            fl.LayerNorm2d(channels=intermediate_channels // 4, device=device, dtype=dtype),
            fl.GeLU(),
            fl.Conv2d(
                in_channels=intermediate_channels // 4,
                out_channels=intermediate_channels,
                kernel_size=2,
                stride=2,
                device=device,
                dtype=dtype,
            ),
            fl.LayerNorm2d(channels=intermediate_channels, device=device, dtype=dtype),
            fl.GeLU(),
            fl.Conv2d(in_channels=intermediate_channels, out_channels=embedding_dim, kernel_size=1, device=device, dtype=dtype),
        )
        self.no_mask_embedding = rng.init_normal((1, embedding_dim), dtype=dtype)

    def get_no_mask_dense_embedding(
        self, image_embedding_size: tuple[int, int], batch_size: int = 1
    ) -> jax.Array:
        """(B, H, W, C) dense embedding when no mask prompt is given."""
        return jnp.broadcast_to(
            self.no_mask_embedding.reshape(1, 1, 1, -1),
            (batch_size, image_embedding_size[0], image_embedding_size[1], self.embedding_dim),
        )
