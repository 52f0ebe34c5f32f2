"""Original-format control-lora loading parity vs the reference.

A synthetic stability-ai-format checkpoint (lora `.up`/`.down` pairs,
`input_hint_block`, `zero_convs`, `middle_block_out`) loads through the
reference's conversion loaders and through our `load_original_weights`;
the patched UNets must produce identical outputs.
"""

import gc

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")

_RANK = 4


def _eligible_layers(control_lora):
    """Linear/Conv2d layers outside ZeroConvolution/ConditionEncoder subtrees,
    in walk order (the auto-attach candidate set)."""
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion.stable_diffusion_xl.control_lora import (
        ConditionEncoder,
        ZeroConvolution,
    )

    out = []
    for module, parent in control_lora.walk(recurse=True):
        if not isinstance(module, (rfl.Linear, rfl.Conv2d)):
            continue
        p = parent
        excluded = False
        while p is not None:
            if isinstance(p, (ZeroConvolution, ConditionEncoder)):
                excluded = True
                break
            p = p.parent
        if not excluded:
            out.append(module)
    return out


def _original_checkpoint(ref_control_lora, seed: int) -> dict[str, torch.Tensor]:
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion.stable_diffusion_xl.control_lora import (
        ConditionEncoder,
        ZeroConvolution,
    )

    g = torch.Generator().manual_seed(seed)

    def t(*shape: int) -> torch.Tensor:
        return torch.randn(*shape, generator=g) * 0.05

    sd: dict[str, torch.Tensor] = {}
    # loras: one per eligible layer, stems named in walk order so both sides'
    # sorted order equals walk order (no q/k/v suffix → constant score)
    for n, layer in enumerate(_eligible_layers(ref_control_lora)):
        stem = f"lora.a{n:04d}"
        if isinstance(layer, rfl.Linear):
            d_out, d_in = layer.weight.shape
            sd[f"{stem}.down"] = t(_RANK, d_in)
            sd[f"{stem}.up"] = t(d_out, _RANK)
        else:
            d_out, d_in, kh, kw = layer.weight.shape
            sd[f"{stem}.down"] = t(_RANK, d_in, kh, kw)
            sd[f"{stem}.up"] = t(d_out, _RANK, 1, 1)

    # condition encoder convs
    encoder = ref_control_lora.ensure_find(ConditionEncoder)
    for i, conv in enumerate(encoder.layers(rfl.Conv2d, recurse=True)):
        sd[f"input_hint_block.{2 * i}.weight"] = t(*conv.weight.shape)
        sd[f"input_hint_block.{2 * i}.bias"] = t(conv.weight.shape[0])

    # zero convolutions (down taps then middle)
    zero_convs = [z.ensure_find(rfl.Conv2d) for z in ref_control_lora.layers(ZeroConvolution)]
    for i, conv in enumerate(zero_convs):
        stem = f"zero_convs.{i}.0" if i < len(zero_convs) - 1 else "middle_block_out.0"
        sd[f"{stem}.weight"] = t(*conv.weight.shape)
        sd[f"{stem}.bias"] = t(conv.weight.shape[0])
    return sd


@pytest.mark.slow
def test_control_lora_original_format_parity() -> None:
    torch.manual_seed(8)
    from refiners.conversion.models.controllora_sdxl import (
        load_condition_encoder,
        load_lora_layers,
        load_zero_convolutions,
    )
    from refiners.foundationals.latent_diffusion import SDXLUNet as RefUNet
    from refiners.foundationals.latent_diffusion.stable_diffusion_xl.control_lora import (
        ControlLoraAdapter as RefAdapter,
    )

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import ControlLoraAdapter
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import SDXLUNet

    ref_unet = RefUNet(in_channels=4).eval()
    our_unet = SDXLUNet(in_channels=4)
    load_reference_state_dict(our_unet, {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()})

    torch.manual_seed(9)
    ref_adapter = RefAdapter(name="tile", target=ref_unet, scale=0.8).inject()
    our_adapter = ControlLoraAdapter(name="tile", target=our_unet, scale=0.8).inject()
    # base (pre-lora) control-lora halves must share weights: transfer via
    # the reference-layout state dict
    from refiners_tpu.conversion.refiners_compat import convert_refiners_state_dict

    ref_cl_state = {k: v.detach().numpy() for k, v in ref_adapter.control_lora.state_dict().items()}
    our_adapter.control_lora.load_state_dict(
        convert_refiners_state_dict(ref_cl_state, our_adapter.control_lora, strict=False), strict=False
    )

    checkpoint = _original_checkpoint(ref_adapter.control_lora, seed=11)
    # attach the loras on the reference side via the runtime path (the
    # conversion module's load_lora_layers ejects the adapters afterwards for
    # serialization; re-injecting them is not a supported flow and produces
    # different wiring)
    from refiners.conversion.models.controllora_sdxl import sort_keys as ref_sort_keys
    from refiners.fluxion.adapters.lora import Lora as RefLora, auto_attach_loras as ref_auto_attach

    ref_lora_weights = {
        f"{k}.weight": v for k, v in checkpoint.items() if ".up" in k or ".down" in k
    }
    ref_loras = RefLora.from_dict("tile", ref_lora_weights)
    ref_loras = {k: ref_loras[k] for k in sorted(ref_loras, key=ref_sort_keys)}
    failed = ref_auto_attach(
        ref_loras, ref_adapter.control_lora, exclude=["ZeroConvolution", "ConditionEncoder"]
    )
    assert not failed
    load_condition_encoder(dict(checkpoint), ref_adapter.control_lora)
    load_zero_convolutions(dict(checkpoint), ref_adapter.control_lora)

    our_adapter.load_original_weights({k: v.numpy() for k, v in checkpoint.items()})

    rs = np.random.RandomState(5)
    x = rs.randn(1, 4, 16, 16).astype(np.float32)
    text = rs.randn(1, 77, 2048).astype(np.float32)
    pooled = rs.randn(1, 1280).astype(np.float32)
    time_ids = np.zeros((1, 6), dtype=np.float32)
    condition = rs.rand(1, 3, 128, 128).astype(np.float32)

    with torch.no_grad():
        ref_adapter.set_condition(torch.from_numpy(condition.copy()))
        ref_unet.set_timestep(torch.tensor([400]))
        ref_unet.set_clip_text_embedding(torch.from_numpy(text.copy()))
        ref_unet.set_pooled_text_embedding(torch.from_numpy(pooled.copy()))
        ref_unet.set_time_ids(torch.from_numpy(time_ids.copy()))
        expected = ref_unet(torch.from_numpy(x.copy())).numpy()
    del ref_unet, ref_adapter
    gc.collect()

    our_adapter.set_condition(jnp.asarray(condition.transpose(0, 2, 3, 1)))
    our_unet.set_timestep(jnp.asarray([400]))
    our_unet.set_clip_text_embedding(jnp.asarray(text))
    our_unet.set_pooled_text_embedding(jnp.asarray(pooled))
    our_unet.set_time_ids(jnp.asarray(time_ids))
    got = np.asarray(our_unet(jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, expected, atol=5e-3)
