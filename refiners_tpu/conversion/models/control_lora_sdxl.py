"""Control-LoRA (SDXL) conversion: original stability-ai checkpoints →
refiners hub layout.

Reference: /root/reference/src/refiners/conversion/models/controllora_sdxl.py
(load_lora_layers :48, load_zero_convolutions :129, load_condition_encoder :98,
convert_* :160-251, canny/cpds hub entries :320-345). The original format is
LDM-style (`.up`/`.down` lora pairs, `input_hint_block`, `zero_convs`,
`middle_block_out`); the converted format keys loras by their target path
under `ControlLora.`, zero convs as `ZeroConvolution_{i:02d}.…`, and the
condition encoder under `ConditionEncoder.…`, all in torch tensor layouts so
the published refiners checkpoints stay interchangeable.
"""

from __future__ import annotations

from typing import Any

from refiners_tpu.conversion.utils import Hub

canny_original = Hub(
    repo_id="lllyasviel/misc",
    filename="control-lora-canny-rank128.safetensors",
    revision="71f7a66a7affe631c64af469fe647217d422cac0",
    expected_sha256="56389dbb245ca44de91d662529bd4298abc55ce2318f60bc19454fb72ff68247",
)
canny_converted = Hub(
    repo_id="refiners/sdxl.controllora.canny",
    filename="model.safetensors",
    expected_sha256="6edfa742e2b5191ce357fb559e236652b004feea490c4f1277b30abc9804321f",
)
cpds_original = Hub(
    repo_id="lllyasviel/misc",
    filename="fooocus_xl_cpds_128.safetensors",
    revision="71f7a66a7affe631c64af469fe647217d422cac0",
    expected_sha256="eec3fd8209a65b41341ea9f415de66909c97b30fb4d20965b3304e8e5251c2f1",
)
cpds_converted = Hub(
    repo_id="refiners/sdxl.controllora.cpds",
    filename="model.safetensors",
    expected_sha256="9a3b2a86f32e4747e98531b0af8b59a804391b538949a0dd85263722b6e64db0",
)


def _simplify_key(key: str, prefix: str, index: int | None = None) -> str:
    """Strip everything left of `prefix`, optionally zero-pad-index it
    (reference controllora_sdxl.py:165-189)."""
    _, right = key.split(prefix, maxsplit=1)
    if index:
        return f"{prefix}_{index:02d}{right}"
    return f"{prefix}{right}"


def convert_controllora_sdxl(state_dict: dict[str, Any], name: str = "converted") -> dict[str, Any]:
    """Original control-lora checkpoint → refiners-hub-layout state dict.

    Builds a real ControlLora over an SDXLUNet, loads the original weights
    through the runtime loader (lora auto-attach with the original key-sort
    heuristics), then reads every weight back out keyed by its tree path —
    exactly the reference's convert flow (controllora_sdxl.py:272-307).
    """
    import jax.numpy as jnp

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.fluxion.adapters.lora import Lora, LoraAdapter
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.control_lora import (
        ConditionEncoder,
        ControlLoraAdapter,
        ZeroConvolution,
    )
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLUNet

    unet = SDXLUNet(in_channels=4)
    adapter = ControlLoraAdapter(target=unet, name=name).inject()
    control_lora = adapter.control_lora
    adapter.load_original_weights(state_dict)

    converted: dict[str, Any] = {}

    # loras: keyed by target path relative to the ControlLora, torch layout.
    # Eject the adapters first so each path reads as if never injected — the
    # runtime loader resolves these paths on a bare tree (reference
    # controllora_sdxl.py:88-93 does the same).
    entries: list[tuple[Any, LoraAdapter]] = []
    for lora in control_lora.layers(Lora, recurse=True):
        lora_adapter = lora.parent
        assert isinstance(lora_adapter, LoraAdapter)
        entries.append((lora, lora_adapter))
    for _, lora_adapter in entries:
        lora_adapter.eject()
    for lora, lora_adapter in entries:
        target = lora_adapter.target
        path = target.get_path(parent=control_lora.ensure_find_parent(target))
        down, up = lora.checkpoint_weights()
        converted[_simplify_key(f"{path}.down", "ControlLora.")] = down
        converted[_simplify_key(f"{path}.up", "ControlLora.")] = up

    # zero convolutions: ZeroConvolution_{i:02d}.Conv2d.* (torch OIHW)
    for i, zero in enumerate(control_lora.layers(ZeroConvolution, recurse=True)):
        conv = zero.ensure_find(fl.Conv2d)
        path = zero.get_path()
        key = _simplify_key(f"{path}.Conv2d", "ZeroConvolution", i + 1)
        converted[f"{key}.weight"] = jnp.transpose(conv.weight, (3, 2, 0, 1))
        if conv.bias is not None:
            converted[f"{key}.bias"] = conv.bias

    # condition encoder convs (torch OIHW); walk yields (module, parent)
    encoder = control_lora.ensure_find(ConditionEncoder)
    for conv, conv_parent in encoder.walk(fl.Conv2d, recurse=True):
        path = conv.get_path(parent=conv_parent)
        key = _simplify_key(path, "ConditionEncoder")
        converted[f"{key}.weight"] = jnp.transpose(conv.weight, (3, 2, 0, 1))
        if conv.bias is not None:
            converted[f"{key}.bias"] = conv.bias

    adapter.eject()
    return converted
