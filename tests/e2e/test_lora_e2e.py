"""Kohya/CivitAI-format LoRA auto-attach parity vs the reference.

A synthetic kohya-style LoRA state dict (cross-attention projections of every
SD1.5 attention block) loads through both SDLoraManagers; key sorting and
shape-based auto-attach walk order must agree, so the patched UNets must
produce identical outputs.
"""

import gc

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")

_RANK = 4


def _full_coverage_lora(ref_unet, seed: int) -> dict[str, np.ndarray]:
    """One LoRA per Linear under every CrossAttentionBlock, named in walk
    order (unique prefixes, no q/k/v suffix scoring) so sorted order equals
    walk order on both sides — exact coverage, unambiguous auto-attach."""
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion.cross_attention import CrossAttentionBlock

    rs = np.random.RandomState(seed)
    sd: dict[str, np.ndarray] = {}
    n = 0
    for block in ref_unet.layers(CrossAttentionBlock):
        for linear in block.layers(rfl.Linear):
            d_out, d_in = linear.weight.shape
            base = f"lora_unet_L{n:04d}"
            sd[f"{base}.lora_down.weight"] = rs.randn(_RANK, d_in).astype(np.float32) * 0.1
            sd[f"{base}.lora_up.weight"] = rs.randn(d_out, _RANK).astype(np.float32) * 0.1
            n += 1
    return sd


@pytest.mark.slow
def test_kohya_lora_auto_attach_parity() -> None:
    torch.manual_seed(0)
    from refiners.foundationals.latent_diffusion import StableDiffusion_1 as RefSD
    from refiners.foundationals.latent_diffusion.lora import SDLoraManager as RefManager

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import SDLoraManager, StableDiffusion_1

    ref = RefSD()
    ref.unet.eval()
    ours = StableDiffusion_1()
    load_reference_state_dict(ours.unet, {k: v.detach().numpy() for k, v in ref.unet.state_dict().items()})

    lora = _full_coverage_lora(ref.unet, seed=7)
    kwargs = dict(scale=0.9, unet_inclusions=["CrossAttentionBlock"])
    RefManager(ref).add_loras("style", tensors={k: torch.from_numpy(v.copy()) for k, v in lora.items()}, **kwargs)
    SDLoraManager(ours).add_loras("style", tensors={k: jnp.asarray(v) for k, v in lora.items()}, **kwargs)

    rs = np.random.RandomState(1)
    x = rs.randn(1, 4, 16, 16).astype(np.float32)
    text = rs.randn(1, 77, 768).astype(np.float32)
    with torch.no_grad():
        ref.unet.set_timestep(torch.tensor([500]))
        ref.unet.set_clip_text_embedding(torch.from_numpy(text.copy()))
        expected = ref.unet(torch.from_numpy(x.copy())).numpy()
    del ref
    gc.collect()

    ours.unet.set_timestep(jnp.asarray([500]))
    ours.unet.set_clip_text_embedding(jnp.asarray(text))
    got = np.asarray(ours.unet(jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, atol=2e-3)
