"""End-to-end diffusion pipeline parity vs the reference (random weights).

The reference's e2e tier uses golden images from pretrained checkpoints
(unavailable offline); here the *entire* pipeline — CLIP-L text encoding,
CFG denoising loop with real solvers, VAE decode — runs side by side with
the reference on identical random weights and identical noise, and the
final images must match within the reference's strict tolerances.
"""

import gc
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

VOCAB = Path("/root/reference/src/refiners/foundationals/clip/bpe_simple_vocab_16e6.txt.gz")

pytestmark = pytest.mark.skipif(
    not (reference_available() and VOCAB.exists()), reason="reference package unavailable"
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 100.0 if mse == 0 else 10 * np.log10(1.0 / mse)


@pytest.mark.slow
def test_sd15_txt2img_matches_reference() -> None:
    torch.manual_seed(0)
    import refiners.fluxion.layers  # noqa: F401
    from refiners.foundationals.latent_diffusion import (
        SD1UNet as RefUNet,
        StableDiffusion_1 as RefSD,
    )
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import DDIM, StableDiffusion_1

    steps = 2
    ref = RefSD(solver=RefDDIM(num_inference_steps=steps))
    ref.unet.eval()
    ref.lda.eval()
    ref.clip_text_encoder.eval()

    ours = StableDiffusion_1(solver=DDIM(num_inference_steps=steps))
    load_reference_state_dict(ours.unet, {k: v.detach().numpy() for k, v in ref.unet.state_dict().items()})
    load_reference_state_dict(ours.lda, {k: v.detach().numpy() for k, v in ref.lda.state_dict().items()})
    load_reference_state_dict(
        ours.clip_text_encoder,
        {k: v.detach().numpy() for k, v in ref.clip_text_encoder.state_dict().items()},
    )

    prompt = "a cute cat, best quality"
    negative = "low quality, blurry"

    with torch.no_grad():
        ref_emb = ref.compute_clip_text_embedding(text=prompt, negative_text=negative)
    our_emb = ours.compute_clip_text_embedding(text=prompt, negative_text=negative)
    np.testing.assert_allclose(np.asarray(our_emb), ref_emb.numpy(), atol=1e-4)

    noise = np.random.RandomState(0).randn(1, 4, 32, 32).astype(np.float32)
    x_ref = torch.from_numpy(noise.copy())
    x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))

    with torch.no_grad():
        for step in ref.steps:
            x_ref = ref(x_ref, step=step, clip_text_embedding=ref_emb, condition_scale=7.5)
        image_ref = ref.lda.decode(x_ref).numpy()
    del ref
    gc.collect()

    for step in ours.steps:
        x_our = ours(x_our, step, clip_text_embedding=our_emb, condition_scale=7.5)
    image_our = np.asarray(ours.lda.decode(x_our)).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(
        np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=1e-3
    )
    # pixel-space comparison in [0,1]: reference e2e envelope is PSNR >= 35
    img_a = np.clip((image_our + 1) / 2, 0, 1)
    img_b = np.clip((image_ref + 1) / 2, 0, 1)
    psnr = _psnr(img_a, img_b)
    assert psnr >= 43, f"PSNR {psnr:.2f} below strict threshold"

    # the scanned diffuse path must land on the same latents
    import jax

    x_scan = jax.jit(lambda m, x, e: m.diffuse(x, clip_text_embedding=e, condition_scale=7.5))(
        ours, jnp.asarray(noise.transpose(0, 2, 3, 1)), our_emb
    )
    np.testing.assert_allclose(np.asarray(x_scan), np.asarray(x_our), atol=1e-4)


@pytest.mark.slow
def test_sd15_inpainting_matches_reference() -> None:
    torch.manual_seed(3)
    from PIL import Image

    from refiners.foundationals.latent_diffusion import SD1UNet as RefUNet
    from refiners.foundationals.latent_diffusion.stable_diffusion_1.model import (
        StableDiffusion_1_Inpainting as RefInpaint,
    )
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import DDIM, StableDiffusion_1_Inpainting

    steps = 2
    ref = RefInpaint(unet=RefUNet(in_channels=9), solver=RefDDIM(num_inference_steps=steps))
    ours = StableDiffusion_1_Inpainting(solver=DDIM(num_inference_steps=steps))
    load_reference_state_dict(ours.unet, {k: v.detach().numpy() for k, v in ref.unet.state_dict().items()})
    load_reference_state_dict(ours.lda, {k: v.detach().numpy() for k, v in ref.lda.state_dict().items()})

    rs = np.random.RandomState(0)
    target = Image.fromarray(rs.randint(0, 255, (256, 256, 3), dtype=np.uint8))
    mask = Image.fromarray((rs.rand(256, 256) > 0.5).astype(np.uint8) * 255, mode="L")

    with torch.no_grad():
        ref.set_inpainting_conditions(target, mask, latents_size=(32, 32))
    ours.set_inpainting_conditions(target, mask, latents_size=(32, 32))

    emb = rs.randn(2, 77, 768).astype(np.float32)
    noise = rs.randn(1, 4, 32, 32).astype(np.float32)
    x_ref = torch.from_numpy(noise.copy())
    x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))

    with torch.no_grad():
        for step in ref.steps:
            x_ref = ref(x_ref, step=step, clip_text_embedding=torch.from_numpy(emb.copy()))
    for step in ours.steps:
        x_our = ours(x_our, step, clip_text_embedding=jnp.asarray(emb))

    np.testing.assert_allclose(np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=2e-3)
