"""DINOv2 presets (arXiv:2304.07193).

Reference: /root/reference/src/refiners/foundationals/dinov2/dinov2.py
(DINOv2_small :26 … DINOv2_giant_reg :296, preprocess :9).
"""

from __future__ import annotations

from typing import Any

import jax
from PIL import Image

from refiners_tpu.fluxion.layers.activations import GLU, SiLU
from refiners_tpu.fluxion.utils import image_to_tensor, normalize
from refiners_tpu.foundationals.dinov2.vit import ViT


def preprocess(img: Image.Image, dim: int = 224) -> jax.Array:
    """Resize + ImageNet-normalize (no center crop); (dim, dim, 3) NHWC."""
    img = img.convert("RGB").resize((dim, dim))
    t = image_to_tensor(img)[0]
    return normalize(t, mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225])


def _preset(name: str, doc: str, **config: Any) -> type[ViT]:
    def __init__(self: ViT, device: Any = None, dtype: Any = None) -> None:  # noqa: N807
        kwargs = dict(config)
        if kwargs.pop("glu_ffn", False):
            kwargs["activation"] = GLU(SiLU())
        ViT.__init__(self, device=device, dtype=dtype, **kwargs)

    cls = type(name, (ViT,), {"__init__": __init__, "__doc__": doc})
    return cls


_COMMON = dict(patch_size=14, image_size=518)

DINOv2_small = _preset(
    "DINOv2_small", "DINOv2 small: 384-dim, 12 layers, 6 heads.", embedding_dim=384, num_layers=12, num_heads=6, **_COMMON
)
DINOv2_base = _preset(
    "DINOv2_base", "DINOv2 base: 768-dim, 12 layers, 12 heads.", embedding_dim=768, num_layers=12, num_heads=12, **_COMMON
)
DINOv2_large = _preset(
    "DINOv2_large", "DINOv2 large: 1024-dim, 24 layers, 16 heads.", embedding_dim=1024, num_layers=24, num_heads=16, **_COMMON
)
DINOv2_giant = _preset(
    "DINOv2_giant",
    "DINOv2 giant: 1536-dim, 40 layers, 24 heads, SwiGLU FFN.",
    embedding_dim=1536,
    feedforward_dim=4096,
    num_layers=40,
    num_heads=24,
    glu_ffn=True,
    **_COMMON,
)

_REG = dict(num_registers=4, interpolate_antialias=True)

DINOv2_small_reg = _preset(
    "DINOv2_small_reg", "DINOv2 small with registers.", embedding_dim=384, num_layers=12, num_heads=6, **_COMMON, **_REG
)
DINOv2_base_reg = _preset(
    "DINOv2_base_reg", "DINOv2 base with registers.", embedding_dim=768, num_layers=12, num_heads=12, **_COMMON, **_REG
)
DINOv2_large_reg = _preset(
    "DINOv2_large_reg", "DINOv2 large with registers.", embedding_dim=1024, num_layers=24, num_heads=16, **_COMMON, **_REG
)
DINOv2_giant_reg = _preset(
    "DINOv2_giant_reg",
    "DINOv2 giant with registers.",
    embedding_dim=1536,
    feedforward_dim=4096,
    num_layers=40,
    num_heads=24,
    glu_ffn=True,
    **_COMMON,
    **_REG,
)
