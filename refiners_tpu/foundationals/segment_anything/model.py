"""SegmentAnything facade (arXiv:2304.02643).

Reference: /root/reference/src/refiners/foundationals/segment_anything/model.py
(SegmentAnything :27, compute_image_embedding :81, predict :97,
SegmentAnythingH :202). Image embeddings are NHWC; output masks keep the
reference's (N, M, H, W) layout with a bool dtype when binarized.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from PIL import Image

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.foundationals.segment_anything.image_encoder import SAMViT, SAMViTH
from refiners_tpu.foundationals.segment_anything.mask_decoder import MaskDecoder
from refiners_tpu.foundationals.segment_anything.prompt_encoder import MaskEncoder, PointEncoder
from refiners_tpu.foundationals.segment_anything.utils import (
    normalize_coordinates,
    postprocess_masks,
    preprocess_image,
)


@dataclass
class ImageEmbedding:
    features: jax.Array  # (1, H, W, 256) NHWC
    original_image_size: tuple[int, int]  # (height, width)


class SegmentAnything(fl.Chain):
    mask_threshold: float = 0.0

    def __init__(
        self,
        image_encoder: SAMViT,
        point_encoder: PointEncoder,
        mask_encoder: MaskEncoder,
        mask_decoder: MaskDecoder,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__(image_encoder, point_encoder, mask_encoder, mask_decoder)
        if dtype is not None:
            self.to(dtype=dtype)

    @property
    def image_encoder(self) -> SAMViT:
        return self.ensure_find(SAMViT)

    @property
    def point_encoder(self) -> PointEncoder:
        return self.ensure_find(PointEncoder)

    @property
    def mask_encoder(self) -> MaskEncoder:
        return self.ensure_find(MaskEncoder)

    @property
    def mask_decoder(self) -> MaskDecoder:
        return self.ensure_find(MaskDecoder)

    def compute_image_embedding(self, image: Image.Image) -> ImageEmbedding:
        original_size = (image.height, image.width)
        return ImageEmbedding(
            features=self.image_encoder(self.preprocess_image(image)),
            original_image_size=original_size,
        )

    def predict(
        self,
        input: Image.Image | ImageEmbedding,
        foreground_points: Sequence[tuple[float, float]] | None = None,
        background_points: Sequence[tuple[float, float]] | None = None,
        box_points: Sequence[Sequence[tuple[float, float]]] | None = None,
        low_res_mask: jax.Array | None = None,
        binarize: bool = True,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Points/boxes/mask prompts → (masks, iou_predictions, low_res_masks)
        (model.py:97-160). `low_res_mask` uses the (1, 1, 256, 256) layout."""
        if isinstance(input, ImageEmbedding):
            original_size = input.original_image_size
            image_embedding = input.features
        else:
            original_size = (input.height, input.width)
            image_embedding = self.image_encoder(self.preprocess_image(input))

        coordinates, type_mask = self.point_encoder.points_to_tensor(
            foreground_points=foreground_points,
            background_points=background_points,
            box_points=box_points,
        )
        self.point_encoder.set_type_mask(type_mask=type_mask)

        if low_res_mask is not None:
            mask_embedding = self.mask_encoder(low_res_mask.transpose(0, 2, 3, 1))  # to NHWC
        else:
            mask_embedding = self.mask_encoder.get_no_mask_dense_embedding(
                image_embedding_size=self.image_encoder.image_embedding_size
            )

        point_embedding = self.point_encoder(self.normalize(coordinates, original_size=original_size))
        dense_positional_embedding = self.point_encoder.get_dense_positional_embedding(
            image_embedding_size=self.image_encoder.image_embedding_size
        )

        self.mask_decoder.set_image_embedding(image_embedding=image_embedding)
        self.mask_decoder.set_mask_embedding(mask_embedding=mask_embedding)
        self.mask_decoder.set_point_embedding(point_embedding=point_embedding)
        self.mask_decoder.set_dense_positional_embedding(dense_positional_embedding=dense_positional_embedding)

        low_res_masks, iou_predictions = self.mask_decoder()
        high_res_masks = self.postprocess_masks(low_res_masks, original_size)

        if binarize:
            high_res_masks = high_res_masks > self.mask_threshold
        return high_res_masks, iou_predictions, low_res_masks

    @property
    def image_encoder_resolution(self) -> int:
        w, h = self.image_encoder.image_size
        assert w == h
        return w

    def preprocess_image(self, image: Image.Image) -> jax.Array:
        return preprocess_image(image, self.image_encoder_resolution, dtype=self.dtype)

    def normalize(self, coordinates: jax.Array, original_size: tuple[int, int]) -> jax.Array:
        return normalize_coordinates(coordinates, original_size, self.image_encoder_resolution)

    def postprocess_masks(self, low_res_masks: jax.Array, original_size: tuple[int, int]) -> jax.Array:
        return postprocess_masks(low_res_masks, original_size, self.image_encoder_resolution)


class SegmentAnythingH(SegmentAnything):
    """SegmentAnything ViT-H (model.py:202)."""

    def __init__(
        self,
        image_encoder: SAMViTH | None = None,
        point_encoder: PointEncoder | None = None,
        mask_encoder: MaskEncoder | None = None,
        mask_decoder: MaskDecoder | None = None,
        multimask_output: bool | None = None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        image_encoder = image_encoder or SAMViTH()
        point_encoder = point_encoder or PointEncoder()
        mask_encoder = mask_encoder or MaskEncoder()
        if mask_decoder:
            assert (
                multimask_output is None or mask_decoder.multimask_output == multimask_output
            ), f"mask_decoder.multimask_output {mask_decoder.multimask_output} != multimask_output ({multimask_output})"
        else:
            mask_decoder = MaskDecoder(multimask_output) if multimask_output is not None else MaskDecoder()
        super().__init__(image_encoder, point_encoder, mask_encoder, mask_decoder, device=device, dtype=dtype)

    @property
    def image_encoder(self) -> SAMViTH:
        return self.ensure_find(SAMViTH)
