"""ComfyUI helper nodes.

Reference: /root/reference/src/comfyui-refiners/utils.py:11.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from PIL import ImageDraw

from refiners_tpu.fluxion.utils import image_to_tensor, tensor_to_image

BoundingBox = tuple[int, int, int, int]


class DrawBoundingBox:
    @classmethod
    def INPUT_TYPES(cls) -> dict[str, Any]:
        return {
            "required": {
                "image": ("IMAGE", {}),
                "bbox": ("BOUNDING_BOX", {}),
                "color": ("STRING", {"default": "red"}),
                "width": ("INT", {"default": 3}),
            },
        }

    RETURN_TYPES = ("IMAGE",)
    RETURN_NAMES = ("image",)
    DESCRIPTION = "Draw a bounding box on an image."
    CATEGORY = "RefinersTPU/Helpers"
    FUNCTION = "process"

    def process(
        self,
        image: jax.Array,
        bbox: BoundingBox,
        color: str,
        width: int,
    ) -> tuple[jax.Array]:
        pil_image = tensor_to_image(jnp.asarray(image))
        draw = ImageDraw.Draw(pil_image)
        draw.rectangle(bbox, outline=color, width=width)
        return (image_to_tensor(pil_image),)


NODE_CLASS_MAPPINGS: dict[str, Any] = {
    "DrawBoundingBox": DrawBoundingBox,
}
