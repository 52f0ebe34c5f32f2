"""SD1.5 UNet + VAE numeric parity vs the reference (random weights, CPU).

The reference implementation is imported from /root/reference/src and run
with torch on CPU; its state dict is translated through
`convert_refiners_state_dict` (layout-only transforms) into our NHWC model.
"""

import gc

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


def _to_jax_state(module: "torch.nn.Module") -> dict[str, np.ndarray]:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def nchw(x: jnp.ndarray) -> np.ndarray:
    return np.asarray(x).transpose(0, 3, 1, 2)


@pytest.mark.slow
def test_sd1_unet_matches_reference() -> None:
    torch.manual_seed(0)
    from refiners.foundationals.latent_diffusion import SD1UNet as RefUNet

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import SD1UNet

    ref = RefUNet(in_channels=4).eval()
    ours = SD1UNet(in_channels=4)
    load_reference_state_dict(ours, _to_jax_state(ref))

    x = torch.randn(1, 4, 32, 32)
    text = torch.randn(1, 77, 768)
    timestep = torch.tensor([501])

    with torch.no_grad():
        ref.set_timestep(timestep)
        ref.set_clip_text_embedding(text)
        expected = ref(x).numpy()
    del ref
    gc.collect()

    ours.set_timestep(jnp.asarray(timestep.numpy()))
    ours.set_clip_text_embedding(jnp.asarray(text.numpy()))
    got = nchw(ours(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))

    np.testing.assert_allclose(got, expected, atol=5e-4)


@pytest.mark.slow
def test_sd1_autoencoder_matches_reference() -> None:
    torch.manual_seed(1)
    from refiners.foundationals.latent_diffusion.stable_diffusion_1.model import SD1Autoencoder as RefLDA

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import SD1Autoencoder

    ref = RefLDA().eval()
    ours = SD1Autoencoder()
    load_reference_state_dict(ours, _to_jax_state(ref))

    img = torch.randn(1, 3, 64, 64).clamp(-1, 1)
    with torch.no_grad():
        lat_ref = ref.encode(img)
        dec_ref = ref.decode(lat_ref)
    del ref
    gc.collect()

    lat = ours.encode(jnp.asarray(img.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(nchw(lat), lat_ref.numpy(), atol=5e-4)
    dec = ours.decode(lat)
    np.testing.assert_allclose(nchw(dec), dec_ref.numpy(), atol=5e-3)
