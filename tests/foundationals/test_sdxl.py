"""SDXL UNet parity vs the reference (random weights, CPU)."""

import gc

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


@pytest.mark.slow
def test_sdxl_unet_matches_reference() -> None:
    torch.manual_seed(0)
    from refiners.foundationals.latent_diffusion import SDXLUNet as RefUNet

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import SDXLUNet

    ref = RefUNet(in_channels=4).eval()
    ours = SDXLUNet(in_channels=4)
    load_reference_state_dict(ours, {k: v.detach().numpy() for k, v in ref.state_dict().items()})

    x = torch.randn(1, 4, 24, 24)
    text = torch.randn(1, 77, 2048)
    pooled = torch.randn(1, 1280)
    time_ids = torch.tensor([[1024, 1024, 0, 0, 1024, 1024]], dtype=torch.float32)
    timestep = torch.tensor([801])

    with torch.no_grad():
        ref.set_timestep(timestep)
        ref.set_clip_text_embedding(text)
        ref.set_pooled_text_embedding(pooled)
        ref.set_time_ids(time_ids)
        expected = ref(x).numpy()
    del ref
    gc.collect()

    ours.set_timestep(jnp.asarray(timestep.numpy()))
    ours.set_clip_text_embedding(jnp.asarray(text.numpy()))
    ours.set_pooled_text_embedding(jnp.asarray(pooled.numpy()))
    ours.set_time_ids(jnp.asarray(time_ids.numpy()))
    got = np.asarray(ours(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, expected, atol=5e-4)
