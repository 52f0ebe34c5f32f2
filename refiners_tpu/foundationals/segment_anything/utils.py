"""SAM pre/post-processing utilities.

Reference: /root/reference/src/refiners/foundationals/segment_anything/utils.py
(preprocess_image :46, postprocess_masks :93, normalize_coordinates :111).
Images are NHWC; masks keep the reference's (N, M, H, W) public layout.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from PIL import Image

from refiners_tpu.fluxion.utils import image_to_tensor, interpolate, normalize, pad


def compute_scaled_size(size: tuple[int, int], image_encoder_resolution: int) -> tuple[int, int]:
    """Aspect-preserving size fitting in the encoder square (utils.py:7)."""
    oldh, oldw = size
    scale = image_encoder_resolution * 1.0 / max(oldh, oldw)
    newh, neww = oldh * scale, oldw * scale
    return (int(newh + 0.5), int(neww + 0.5))


def image_to_scaled_tensor(
    image: Image.Image, scaled_size: tuple[int, int], device: Any = None, dtype: Any = None
) -> jax.Array:
    """(1, h, w, c) tensor in [0, 255]."""
    h, w = scaled_size
    resized = image.resize((w, h), resample=Image.Resampling.BILINEAR)
    return image_to_tensor(resized, device=device, dtype=dtype) * 255.0


def preprocess_image(
    image: Image.Image, image_encoder_resolution: int, device: Any = None, dtype: Any = None
) -> jax.Array:
    """Resize long side to the encoder resolution, normalize, zero-pad square."""
    scaled_size = compute_scaled_size((image.height, image.width), image_encoder_resolution)
    image_tensor = image_to_scaled_tensor(image, scaled_size, device=device, dtype=dtype)
    return pad_image_tensor(
        normalize(image_tensor, mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375]),
        scaled_size,
        image_encoder_resolution,
    )


def pad_image_tensor(image_tensor: jax.Array, scaled_size: tuple[int, int], image_encoder_resolution: int) -> jax.Array:
    assert image_tensor.ndim == 4
    assert image_tensor.shape[1] <= image_encoder_resolution  # H
    assert image_tensor.shape[2] <= image_encoder_resolution  # W
    h, w = scaled_size
    padh = image_encoder_resolution - h
    padw = image_encoder_resolution - w
    # NHWC: skip the channel dim, then pad W and H
    return pad(image_tensor, (0, 0, 0, padw, 0, padh))


def postprocess_masks(
    low_res_masks: jax.Array, original_size: tuple[int, int], image_encoder_resolution: int
) -> jax.Array:
    """(N, M, 256, 256) → (N, M, H, W): upsample, crop padding, resize (utils.py:93)."""
    scaled_size = compute_scaled_size(original_size, image_encoder_resolution)
    nhwc = low_res_masks.transpose(0, 2, 3, 1)
    masks = interpolate(nhwc, (image_encoder_resolution, image_encoder_resolution), mode="bilinear")
    masks = masks[:, : scaled_size[0], : scaled_size[1], :]  # remove preprocess padding
    masks = interpolate(masks, original_size, mode="bilinear")
    return masks.transpose(0, 3, 1, 2)


def normalize_coordinates(
    coordinates: jax.Array, original_size: tuple[int, int], image_encoder_resolution: int
) -> jax.Array:
    """Map pixel coordinates to [0, 1] encoder space (utils.py:111)."""
    scaled_size = compute_scaled_size(original_size, image_encoder_resolution)
    x = ((coordinates[:, :, 0] * (scaled_size[1] / original_size[1])) + 0.5) / image_encoder_resolution
    y = ((coordinates[:, :, 1] * (scaled_size[0] / original_size[0])) + 0.5) / image_encoder_resolution
    return jnp.stack([x, y], axis=-1)
