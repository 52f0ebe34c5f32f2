"""Programmatic upstream converters vs the reference implementations.

Synthetic upstream checkpoints run through both the reference converter and
ours; outputs must agree key-by-key and value-by-value.
"""

import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


def _compare(ours: dict, theirs: dict) -> None:
    assert set(ours) == set(theirs), (
        f"only ours: {sorted(set(ours) - set(theirs))[:4]}; only theirs: {sorted(set(theirs) - set(ours))[:4]}"
    )
    for k, v in theirs.items():
        np.testing.assert_array_equal(np.asarray(ours[k]), np.asarray(v), err_msg=k)


def _dinov2_checkpoint(depth: int, dim: int, glu: bool, registers: bool) -> dict[str, torch.Tensor]:
    g = torch.Generator().manual_seed(0)

    def t(*shape: int) -> torch.Tensor:
        return torch.randn(*shape, generator=g)

    sd = {
        "mask_token": t(1, dim),
        "cls_token": t(1, 1, dim),
        "pos_embed": t(1, 257, dim),
        "patch_embed.proj.weight": t(dim, 3, 14, 14),
        "patch_embed.proj.bias": t(dim),
        "norm.weight": t(dim),
        "norm.bias": t(dim),
    }
    if registers:
        sd["register_tokens"] = t(1, 4, dim)
    for i in range(depth):
        b = f"blocks.{i}"
        sd |= {
            f"{b}.norm1.weight": t(dim),
            f"{b}.norm1.bias": t(dim),
            f"{b}.attn.qkv.weight": t(3 * dim, dim),
            f"{b}.attn.qkv.bias": t(3 * dim),
            f"{b}.attn.proj.weight": t(dim, dim),
            f"{b}.attn.proj.bias": t(dim),
            f"{b}.ls1.gamma": t(dim),
            f"{b}.norm2.weight": t(dim),
            f"{b}.norm2.bias": t(dim),
            f"{b}.ls2.gamma": t(dim),
        }
        if glu:
            sd |= {
                f"{b}.mlp.w12.weight": t(8 * dim, dim),
                f"{b}.mlp.w12.bias": t(8 * dim),
                f"{b}.mlp.w3.weight": t(dim, 4 * dim),
                f"{b}.mlp.w3.bias": t(dim),
            }
        else:
            sd |= {
                f"{b}.mlp.fc1.weight": t(4 * dim, dim),
                f"{b}.mlp.fc1.bias": t(4 * dim),
                f"{b}.mlp.fc2.weight": t(dim, 4 * dim),
                f"{b}.mlp.fc2.bias": t(dim),
            }
    return sd


@pytest.mark.parametrize("glu,registers", [(False, False), (True, True)])
def test_dinov2_converter(glu: bool, registers: bool) -> None:
    from refiners.conversion.models.dinov2 import convert_dinov2_facebook as ref_convert

    from refiners_tpu.conversion.models.foundationals import convert_dinov2_facebook

    sd = _dinov2_checkpoint(depth=2, dim=8, glu=glu, registers=registers)
    ours = convert_dinov2_facebook({k: v.numpy() for k, v in sd.items()})
    theirs = dict(sd)
    ref_convert(theirs)  # mutates in place
    _compare(ours, {k: v.numpy() for k, v in theirs.items()})


def test_ella_converter() -> None:
    from refiners.conversion.models.ella import convert_state_dict as ref_convert

    from refiners_tpu.conversion.models.foundationals import convert_ella_tencent

    g = torch.Generator().manual_seed(1)

    def t(*shape: int) -> torch.Tensor:
        return torch.randn(*shape, generator=g)

    d = 16
    sd: dict[str, torch.Tensor] = {
        "connector.latents": t(8, d),
        "connector.time_embedding.linear_1.weight": t(d, d),
        "connector.time_embedding.linear_1.bias": t(d),
        "connector.time_embedding.linear_2.weight": t(d, d),
        "connector.time_embedding.linear_2.bias": t(d),
        "connector.proj_in.weight": t(d, 24),
        "connector.proj_in.bias": t(d),
        "connector.time_aware_linear.weight": t(d, d),
        "connector.time_aware_linear.bias": t(d),
    }
    for i in range(2):
        b = f"connector.blocks.{i}"
        sd |= {
            f"{b}.attn.in_proj_weight": t(3 * d, d),
            f"{b}.attn.in_proj_bias": t(3 * d),
            f"{b}.attn.out_proj.weight": t(d, d),
            f"{b}.attn.out_proj.bias": t(d),
            f"{b}.ln_1.linear.weight": t(2 * d, d),
            f"{b}.ln_1.linear.bias": t(2 * d),
            f"{b}.ln_2.linear.weight": t(2 * d, d),
            f"{b}.ln_2.linear.bias": t(2 * d),
            f"{b}.ln_ff.linear.weight": t(2 * d, d),
            f"{b}.ln_ff.linear.bias": t(2 * d),
            f"{b}.mlp.c_fc.weight": t(4 * d, d),
            f"{b}.mlp.c_fc.bias": t(4 * d),
            f"{b}.mlp.c_proj.weight": t(d, 4 * d),
            f"{b}.mlp.c_proj.bias": t(d),
        }
    ours = convert_ella_tencent({k: v.numpy() for k, v in sd.items()})
    theirs = ref_convert(dict(sd))
    _compare(ours, {k: v.numpy() for k, v in theirs.items()})


def test_mvanet_converter() -> None:
    from refiners.conversion.models.mvanet import convert_weights as ref_convert

    from refiners_tpu.conversion.models.foundationals import convert_mvanet_official

    g = torch.Generator().manual_seed(2)

    def t() -> torch.Tensor:
        return torch.randn(2, generator=g)

    sd: dict[str, torch.Tensor] = {}
    # swin backbone: patch embed, one block per layer, downsample, norms
    sd["backbone.patch_embed.proj.weight"] = t()
    sd["backbone.patch_embed.norm.weight"] = t()
    for layer in range(4):
        b = f"backbone.layers.{layer}.blocks.0"
        for leaf in [
            "norm1.weight", "norm1.bias", "norm2.weight", "norm2.bias",
            "attn.qkv.weight", "attn.qkv.bias", "attn.proj.weight", "attn.proj.bias",
            "attn.relative_position_bias_table", "attn.relative_position_index",
            "mlp.fc1.weight", "mlp.fc1.bias", "mlp.fc2.weight", "mlp.fc2.bias",
        ]:
            sd[f"{b}.{leaf}"] = t()
        if layer < 3:
            sd[f"backbone.layers.{layer}.downsample.reduction.weight"] = t()
            sd[f"backbone.layers.{layer}.downsample.norm.weight"] = t()
    sd["backbone.norm1.weight"] = t()
    sd["backbone.norm3.weight"] = t()
    # MVANet head
    sd["shallow.0.weight"] = t()
    for n in range(1, 6):
        for s in range(3):
            sd[f"output{n}.{s}.weight"] = t()
    for n in range(1, 5):
        for s in range(3):
            sd[f"conv{n}.{s}.weight"] = t()
    for piece in ["linear1", "linear2", "linear3", "linear4", "norm1", "norm2"]:
        sd[f"multifieldcrossatt.{piece}.weight"] = t()
    for n in range(5):
        sd[f"multifieldcrossatt.attention.{n}.in_proj_weight"] = t()
    sd["multifieldcrossatt.linear5.weight"] = t()  # dropped
    for blk in range(1, 5):
        for piece in ["linear1", "linear3", "linear4", "norm1", "norm2", "sal_conv"]:
            sd[f"dec_blk{blk}.{piece}.weight"] = t()
        for n in range(8):
            sd[f"dec_blk{blk}.attention.{n}.in_proj_weight"] = t()
    for s in range(7):
        sd[f"insmask_head.{s}.weight"] = t()
    for up in ("upsample1", "upsample2"):
        for s in range(2):
            sd[f"{up}.{s}.weight"] = t()
    sd["output.0.weight"] = t()
    sd["sideout5.0.weight"] = t()  # dropped

    ours = convert_mvanet_official({k: v.numpy() for k, v in sd.items()})
    theirs = ref_convert(dict(sd))
    _compare(ours, {k: v.numpy() for k, v in theirs.items()})
