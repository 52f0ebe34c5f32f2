"""ComfyUI BoxSegmenter nodes.

Reference: /root/reference/src/comfyui-refiners/box_segmenter.py:10/:60.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion.utils import image_to_tensor, tensor_to_image
from refiners_tpu.solutions import BoxSegmenter as _BoxSegmenter
from refiners_tpu.solutions.box_segmenter import BoundingBox


class LoadBoxSegmenter:
    @classmethod
    def INPUT_TYPES(cls) -> dict[str, Any]:
        return {
            "required": {
                "checkpoint": ("PATH", {}),
                "margin": ("FLOAT", {"default": 0.05, "min": 0.0, "max": 1.0, "step": 0.01}),
                "device": ("STRING", {"default": "tpu"}),
            }
        }

    RETURN_TYPES = ("MODEL",)
    RETURN_NAMES = ("model",)
    DESCRIPTION = "Load a BoxSegmenter refiners-tpu model."
    CATEGORY = "RefinersTPU/Solutions"
    FUNCTION = "load"

    def load(self, checkpoint: str, margin: float, device: str) -> tuple[_BoxSegmenter]:
        return (_BoxSegmenter(weights=checkpoint, margin=margin, device=device),)


class BoxSegmenter:
    @classmethod
    def INPUT_TYPES(cls) -> dict[str, Any]:
        return {
            "required": {
                "model": ("MODEL", {}),
                "image": ("IMAGE", {}),
            },
            "optional": {
                "bbox": ("BOUNDING_BOX", {}),
            },
        }

    RETURN_TYPES = ("MASK",)
    RETURN_NAMES = ("mask",)
    DESCRIPTION = "Segment an image using a BoxSegmenter model and a bbox."
    CATEGORY = "RefinersTPU/Solutions"
    FUNCTION = "process"

    def process(
        self,
        model: _BoxSegmenter,
        image: jax.Array,
        bbox: BoundingBox | None = None,
    ) -> tuple[jax.Array]:
        # ComfyUI images are already (B, H, W, C)
        pil_image = tensor_to_image(jnp.asarray(image))
        mask = model(img=pil_image, box_prompt=bbox)
        mask_tensor = image_to_tensor(mask)[..., 0]  # (1, H, W)
        return (mask_tensor,)


NODE_CLASS_MAPPINGS: dict[str, Any] = {
    "BoxSegmenter": BoxSegmenter,
    "LoadBoxSegmenter": LoadBoxSegmenter,
}
