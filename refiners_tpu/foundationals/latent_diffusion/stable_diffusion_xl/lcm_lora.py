"""LCM-LoRA (arXiv:2311.05556) attachment for SDXL.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/stable_diffusion_xl/lcm_lora.py:25.
Also fits LoRAs with a similar structure (e.g. SDXL-Lightning, arXiv:2402.13929).
"""

from __future__ import annotations

import jax

from refiners_tpu.fluxion.adapters.lora import Lora, auto_attach_loras
from refiners_tpu.foundationals.latent_diffusion.lora import SDLoraManager
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.model import StableDiffusion_XL


def _check_validity(debug_map: list[tuple[str, str]]) -> None:
    """Verify keys attach inside the expected UNet blocks (lcm_lora.py:8)."""
    prefix_map = {
        "down_blocks_0": ["DownBlocks.Chain_1", "DownBlocks.Chain_2", "DownBlocks.Chain_3", "DownBlocks.Chain_4"],
        "down_blocks_1": ["DownBlocks.Chain_5", "DownBlocks.Chain_6", "DownBlocks.Chain_7"],
        "down_blocks_2": ["DownBlocks.Chain_8", "DownBlocks.Chain_9"],
        "mid_block": ["MiddleBlock"],
        "up_blocks_0": ["UpBlocks.Chain_1", "UpBlocks.Chain_2", "UpBlocks.Chain_3"],
        "up_blocks_1": ["UpBlocks.Chain_4", "UpBlocks.Chain_5", "UpBlocks.Chain_6"],
        "up_blocks_2": ["UpBlocks.Chain_7", "UpBlocks.Chain_8", "UpBlocks.Chain_9"],
    }
    for key, path in debug_map:
        for key_pfx, paths_pfxs in prefix_map.items():
            if key.startswith(f"lora_unet_{key_pfx}"):
                assert any(path.startswith(f"SDXLUNet.{x}") for x in paths_pfxs), f"bad mapping: {key} {path}"


def add_lcm_lora(
    manager: SDLoraManager,
    tensors: dict[str, jax.Array],
    name: str = "lcm",
    scale: float = 8.0 / 64.0,
    check_validity: bool = True,
) -> None:
    """Attach an LCM-LoRA in several filtered passes (lcm_lora.py:25)."""
    assert isinstance(manager.target, StableDiffusion_XL)
    unet = manager.target.unet

    loras = Lora.from_dict(name, dict(tensors))
    assert all(k.startswith("lora_unet_") for k in loras.keys())
    loras = {k: loras[k] for k in sorted(loras.keys(), key=SDLoraManager.sort_keys)}

    debug_map: list[tuple[str, str]] | None = [] if check_validity else None

    # projections live in SDXLCrossAttention but not in CrossAttentionBlock
    loras_projs = {k: v for k, v in loras.items() if k.endswith("proj_in") or k.endswith("proj_out")}
    auto_attach_loras(
        loras_projs,
        unet,
        exclude=["CrossAttentionBlock"],
        include=["SDXLCrossAttention"],
        debug_map=debug_map,
    )

    manager.add_loras_to_unet(
        {k: v for k, v in loras.items() if k not in loras_projs},
        debug_map=debug_map,
    )

    if debug_map is not None:
        _check_validity(debug_map)

    manager.set_scale(name, scale)
