"""Full-trajectory (30-step) parity vs the reference — accumulated solver
drift, gated by the reference's full similarity envelope
(PSNR + SSIM + DINOv2 cosine, /root/reference/tests/utils.py:46-62).

Resolution is reduced (256²/192²) to keep the torch reference side feasible
on the CPU test box; trajectory length — the thing that accumulates solver
error — matches the reference's production default of 30 steps
(/root/reference/src/refiners/foundationals/latent_diffusion/stable_diffusion_1/model.py:95).
"""

import gc
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available
from tests.utils import ensure_similar_images

VOCAB = Path("/root/reference/src/refiners/foundationals/clip/bpe_simple_vocab_16e6.txt.gz")

pytestmark = pytest.mark.skipif(
    not (reference_available() and VOCAB.exists()), reason="reference package unavailable"
)


@pytest.mark.slow
def test_sd15_txt2img_30_steps_envelope() -> None:
    torch.manual_seed(0)
    import refiners.fluxion.layers  # noqa: F401
    from refiners.foundationals.latent_diffusion import StableDiffusion_1 as RefSD
    from refiners.foundationals.latent_diffusion.solvers import DPMSolver as RefDPM

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import DPMSolver, StableDiffusion_1

    steps = 30
    ref = RefSD(solver=RefDPM(num_inference_steps=steps))
    ref.unet.eval()
    ref.lda.eval()
    ref.clip_text_encoder.eval()

    ours = StableDiffusion_1(solver=DPMSolver(num_inference_steps=steps))
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

    noise = np.random.RandomState(0).randn(1, 4, 32, 32).astype(np.float32)
    x_ref = torch.from_numpy(noise.copy())
    x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))

    with torch.no_grad():
        for step in ref.steps:
            x_ref = ref(x_ref, step=step, clip_text_embedding=ref_emb, condition_scale=7.5)
        image_ref = ref.lda.decode(x_ref).numpy()
    del ref
    gc.collect()

    # the scanned single-program path (THE deployment path), not a step loop
    z = ours.diffuse(x_our, clip_text_embedding=our_emb, condition_scale=7.5)
    image_our = np.asarray(ours.lda.decode(z))

    ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98, min_dino_cosine=0.99)


@pytest.mark.slow
def test_sdxl_txt2img_30_steps_envelope() -> None:
    torch.manual_seed(5)
    from refiners.foundationals.latent_diffusion import StableDiffusion_XL as RefSDXL
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import DDIM
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import StableDiffusion_XL

    steps = 30
    ref = RefSDXL(solver=RefDDIM(num_inference_steps=steps))
    ref.unet.eval()
    ref.lda.eval()
    ref.clip_text_encoder.eval()

    ours = StableDiffusion_XL(solver=DDIM(num_inference_steps=steps))
    load_reference_state_dict(ours.unet, {k: v.detach().numpy() for k, v in ref.unet.state_dict().items()})
    load_reference_state_dict(ours.lda, {k: v.detach().numpy() for k, v in ref.lda.state_dict().items()})
    load_reference_state_dict(
        ours.clip_text_encoder,
        {k: v.detach().numpy() for k, v in ref.clip_text_encoder.state_dict().items()},
    )

    prompt = "cinematic photo of a castle"
    negative = "low quality"
    with torch.no_grad():
        ref_emb, ref_pooled = ref.compute_clip_text_embedding(text=prompt, negative_text=negative)
    our_emb, our_pooled = ours.compute_clip_text_embedding(text=prompt, negative_text=negative)
    time_ids_ref = ref.default_time_ids

    noise = np.random.RandomState(2).randn(1, 4, 24, 24).astype(np.float32)
    x_ref = torch.from_numpy(noise.copy())
    x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))

    with torch.no_grad():
        for step in ref.steps:
            x_ref = ref(
                x_ref,
                step=step,
                clip_text_embedding=ref_emb,
                pooled_text_embedding=ref_pooled,
                time_ids=time_ids_ref,
                condition_scale=5.0,
            )
        image_ref = ref.lda.decode(x_ref).numpy()
    del ref
    gc.collect()

    z = ours.diffuse(
        x_our,
        clip_text_embedding=our_emb,
        pooled_text_embedding=our_pooled,
        time_ids=ours.default_time_ids,
        condition_scale=5.0,
    )
    image_our = np.asarray(ours.lda.decode(z))

    ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98, min_dino_cosine=0.99)
