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
    compute_scaled_size,
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


@functools.partial(jax.jit, static_argnums=(2,))
def _encode_image(root: fl.Chain, x: jax.Array, scaled_size: tuple[int, int]) -> tuple[jax.Array, dict]:
    """Normalize + pad + ViT encode as ONE compiled program.

    `x` is the host-resized image in [0, 255], already placed on the square
    encoder canvas (raw zero padding). Normalization runs on device — host
    numpy elementwise passes over the 1024² canvas and per-op eager
    dispatches through the TPU tunnel both cost more than the transfer —
    and the padded region is re-zeroed after normalization so it matches
    the reference's pad-after-normalize semantics
    (/root/reference/src/refiners/foundationals/segment_anything/utils.py:46-66).
    """
    h, w = scaled_size
    mean = jnp.asarray([123.675, 116.28, 103.53], dtype=jnp.float32)
    std = jnp.asarray([58.395, 57.12, 57.375], dtype=jnp.float32)
    xn = (x.astype(jnp.float32) - mean) / std
    if h < x.shape[1]:
        xn = xn.at[:, h:, :, :].set(0.0)
    if w < x.shape[2]:
        xn = xn.at[:, :, w:, :].set(0.0)
    vit = root.ensure_find(SAMViT)
    features = vit(xn.astype(vit.dtype))
    captured: dict = {}
    for context, key in _CROSS_STAGE_CONTEXTS:
        store = root.provider.get_context(context)
        if store is not None and store.get(key) is not None:
            captured.setdefault(context, {})[key] = store[key]
    return features, captured


@functools.partial(jax.jit, static_argnums=(3, 6, 7, 8))
def _predict_masks(
    root: fl.Chain,
    image_embedding: jax.Array,
    coordinates: jax.Array,
    type_mask_tuple: tuple[tuple[int, ...], ...],
    low_res_mask: jax.Array | None,
    captured_contexts: dict,
    original_size: tuple[int, int],
    image_encoder_resolution: int,
    binarize: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Coordinate-normalize + prompt-encode + mask-encode + mask-decode +
    mask upsampling + binarize as ONE compiled program.

    Eager dispatch here costs one host round-trip per op — ruinous over a
    remote TPU runtime (measured ~0.09 s dispatch+readback floor per
    standalone call, docs/performance.md) — so everything after the host-side
    prompt packing is fused into a single device program; jit caches per
    (structure, shapes). The type mask is STATIC (a tuple): the prompt-padding
    rule branches on its values on the host, so each prompt configuration
    (points-only, box, ...) compiles its own specialization — contexts cannot
    carry it in, as the provider is rebuilt empty when the pytree is
    unflattened inside the trace. Encoder-stage context values (HQ-SAM's
    early ViT embedding) arrive as explicit traced arguments and are
    re-seeded here for the same reason. Binarized masks are bool on device —
    a 4× smaller readback than f32.
    """
    for context, store in captured_contexts.items():
        root.set_context(context, dict(store))
    point_encoder = root.ensure_find(PointEncoder)
    image_embedding_size = root.ensure_find(SAMViT).image_embedding_size
    mask_decoder = root.ensure_find(MaskDecoder)

    coordinates = normalize_coordinates(coordinates, original_size, image_encoder_resolution)

    if low_res_mask is not None:
        mask_embedding = root.ensure_find(MaskEncoder)(low_res_mask.transpose(0, 2, 3, 1))  # to NHWC
    else:
        mask_embedding = root.ensure_find(MaskEncoder).get_no_mask_dense_embedding(
            image_embedding_size=image_embedding_size
        )

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
    low_res_masks, iou_predictions = mask_decoder()

    high_res_masks = postprocess_masks(low_res_masks, original_size, image_encoder_resolution)
    if binarize:
        high_res_masks = high_res_masks > SegmentAnything.mask_threshold
    return high_res_masks, iou_predictions, low_res_masks


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
        canvas, scaled_size = self._host_preprocess(image)
        features, captured = _encode_image(_root_chain(self), canvas, scaled_size)
        return ImageEmbedding(
            features=features,
            original_image_size=original_size,
            captured_contexts=captured,
        )

    def _host_preprocess(self, image: Image.Image) -> tuple[jax.Array, tuple[int, int]]:
        """Host side of preprocessing: PIL bilinear resize of the long side to
        the encoder resolution, placed raw ([0, 255] uint8) on the square
        canvas. One 3 MB uint8 transfer; normalization runs inside the jitted
        encode program (see `_encode_image`)."""
        res = self.image_encoder_resolution
        scaled_size = compute_scaled_size((image.height, image.width), res)
        h, w = scaled_size
        resized = image.convert("RGB").resize((w, h), resample=Image.Resampling.BILINEAR)
        canvas = np.zeros((1, res, res, 3), dtype=np.uint8)
        canvas[0, :h, :w, :] = np.asarray(resized, dtype=np.uint8)
        return jnp.asarray(canvas), scaled_size

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
            canvas, scaled_size = self._host_preprocess(input)
            image_embedding, captured_contexts = _encode_image(root, canvas, scaled_size)

        coordinates, type_mask = self.point_encoder.points_to_tensor(
            foreground_points=foreground_points,
            background_points=background_points,
            box_points=box_points,
        )

        return _predict_masks(
            root,
            image_embedding,
            coordinates,
            tuple(tuple(int(v) for v in row) for row in np.asarray(type_mask)),
            low_res_mask,
            captured_contexts,
            original_size,
            self.image_encoder_resolution,
            binarize,
        )

    def predict_pipelined(
        self,
        inputs: Sequence[Image.Image | ImageEmbedding],
        prompts: Sequence[dict[str, Any]],
        binarize: bool = True,
    ) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Throughput-oriented serving loop over many requests.

        `predict` never syncs (JAX dispatch is asynchronous), so every
        request's device programs are enqueued BEFORE any result is read
        back; the device→host transfer of request i then overlaps the device
        compute of requests i+1… . On a remote-runtime link with a
        per-round-trip dispatch/readback floor this hides most of the
        per-predict host overhead that serial `predict` + fetch pays
        (measured: docs/performance.md "SAM ViT-H" section). Results come
        back as host numpy triples (masks, iou_predictions, low_res_masks)
        in request order; each triple is fetched in one batched transfer.

        TPU-serving addition — the reference facade
        (/root/reference/src/refiners/foundationals/segment_anything/model.py:97)
        only exposes per-request `predict`.
        """
        pending = [
            self.predict(image, binarize=binarize, **prompt)
            for image, prompt in zip(inputs, prompts, strict=True)
        ]
        return [tuple(np.asarray(a) for a in jax.device_get(out)) for out in pending]

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
