"""ComfyUI custom nodes for refiners-tpu.

Reference: /root/reference/src/comfyui-refiners/__init__.py. ComfyUI images
are (B, H, W, C) tensors in [0, 1] — already our native layout.
"""

from typing import Any

from comfyui_refiners_tpu.box_segmenter import NODE_CLASS_MAPPINGS as BOX_SEGMENTER_NODES
from comfyui_refiners_tpu.grounding_dino import NODE_CLASS_MAPPINGS as GROUNDING_DINO_NODES
from comfyui_refiners_tpu.huggingface import HfHubDownload
from comfyui_refiners_tpu.utils import NODE_CLASS_MAPPINGS as UTILS_NODES

NODE_CLASS_MAPPINGS: dict[str, Any] = {
    **BOX_SEGMENTER_NODES,
    **GROUNDING_DINO_NODES,
    **UTILS_NODES,
    "HfHubDownload": HfHubDownload,
}

__all__ = ["NODE_CLASS_MAPPINGS"]
