"""SegmentAnything facade (arXiv:2304.02643).

Reference: /root/reference/src/refiners/foundationals/segment_anything/model.py
(SegmentAnything :27, compute_image_embedding :81, predict :97,
SegmentAnythingH :202). Image embeddings are NHWC; output masks keep the
reference's (N, M, H, W) layout with a bool dtype when binarized.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
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
    # context values captured during encoding that later stages consume
    # (e.g. HQ-SAM's early ViT embedding); threaded explicitly because
    # contexts do not survive across separate jitted programs
    captured_contexts: dict[str, dict[str, jax.Array]] | None = None


# context keys written by the encoder and read by the decoder, per adapter
_CROSS_STAGE_CONTEXTS: tuple[tuple[str, str], ...] = (("hq_sam", "early_vit_embedding"),)


def _root_chain(module: fl.Chain) -> fl.Chain:
    """Top-most chain (an injected adapter, e.g. HQSAMAdapter, if present) —
    jit must trace from the root so adapter-declared contexts are rebuilt."""
    node: fl.Chain = module
    while getattr(node, "parent", None) is not None:
        node = node.parent  # type: ignore[assignment]
    return node


@jax.jit
def _encode_image(root: fl.Chain, x: jax.Array) -> tuple[jax.Array, dict]:
    features = root.ensure_find(SAMViT)(x)
    captured: dict = {}
    for context, key in _CROSS_STAGE_CONTEXTS:
        store = root.provider.get_context(context)
        if store is not None and store.get(key) is not None:
            captured.setdefault(context, {})[key] = store[key]
    return features, captured


@jax.jit
def _encode_mask(mask_encoder: "MaskEncoder", low_res_mask: jax.Array) -> jax.Array:
    return mask_encoder(low_res_mask)


@functools.partial(jax.jit, static_argnums=(3,))
def _decode_masks(
    root: fl.Chain,
    image_embedding: jax.Array,
    coordinates: jax.Array,
    type_mask_tuple: tuple[tuple[int, ...], ...],
    mask_embedding: jax.Array,
    captured_contexts: dict,
) -> tuple[jax.Array, jax.Array]:
    """Prompt-encode + mask-decode as ONE compiled program.

    Eager dispatch here costs one host round-trip per op — ruinous over a
    remote TPU runtime; jit caches per (structure, shapes). The type mask is
    STATIC (a tuple): the prompt-padding rule branches on its values on the
    host, so each prompt configuration (points-only, box, ...) compiles its
    own specialization — contexts cannot carry it in, as the provider is
    rebuilt empty when the pytree is unflattened inside the trace. Encoder-
    stage context values (HQ-SAM's early ViT embedding) arrive as explicit
    traced arguments and are re-seeded here for the same reason.
    """
    for context, store in captured_contexts.items():
        root.set_context(context, dict(store))
    point_encoder = root.ensure_find(PointEncoder)
    image_embedding_size = root.ensure_find(SAMViT).image_embedding_size
    mask_decoder = root.ensure_find(MaskDecoder)

    type_mask = np.asarray(type_mask_tuple, dtype=np.int32)
    point_encoder.set_type_mask(type_mask=type_mask)
    point_embedding = point_encoder(coordinates)
    dense_positional_embedding = point_encoder.get_dense_positional_embedding(
        image_embedding_size=image_embedding_size
    )
    mask_decoder.set_image_embedding(image_embedding=image_embedding)
    mask_decoder.set_mask_embedding(mask_embedding=mask_embedding)
    mask_decoder.set_point_embedding(point_embedding=point_embedding)
    mask_decoder.set_dense_positional_embedding(dense_positional_embedding=dense_positional_embedding)
    return mask_decoder()


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
        features, captured = _encode_image(_root_chain(self), self.preprocess_image(image))
        return ImageEmbedding(
            features=features,
            original_image_size=original_size,
            captured_contexts=captured,
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
        root = _root_chain(self)
        if isinstance(input, ImageEmbedding):
            original_size = input.original_image_size
            image_embedding = input.features
            captured_contexts = dict(input.captured_contexts or {})
        else:
            original_size = (input.height, input.width)
            image_embedding, captured_contexts = _encode_image(root, self.preprocess_image(input))

        coordinates, type_mask = self.point_encoder.points_to_tensor(
            foreground_points=foreground_points,
            background_points=background_points,
            box_points=box_points,
        )

        if low_res_mask is not None:
            mask_embedding = _encode_mask(self.mask_encoder, low_res_mask.transpose(0, 2, 3, 1))  # to NHWC
        else:
            mask_embedding = self.mask_encoder.get_no_mask_dense_embedding(
                image_embedding_size=self.image_encoder.image_embedding_size
            )

        low_res_masks, iou_predictions = _decode_masks(
            root,
            image_embedding,
            self.normalize(coordinates, original_size=original_size),
            tuple(tuple(int(v) for v in row) for row in np.asarray(type_mask)),
            mask_embedding,
            captured_contexts,
        )
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
