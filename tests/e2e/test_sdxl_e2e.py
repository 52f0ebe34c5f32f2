"""SDXL end-to-end parity vs the reference (random weights).

Full pipeline: DoubleTextEncoder prompt encoding (with pooled embedding +
time ids), CFG denoise step, VAE decode — side by side with the reference.
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


@pytest.mark.slow
def test_sdxl_txt2img_matches_reference() -> None:
    torch.manual_seed(5)
    from refiners.foundationals.latent_diffusion import StableDiffusion_XL as RefSDXL
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import DDIM
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import StableDiffusion_XL

    steps = 1
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
    np.testing.assert_allclose(np.asarray(our_emb), ref_emb.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(our_pooled), ref_pooled.numpy(), atol=1e-4)

    time_ids = ref.default_time_ids
    np.testing.assert_array_equal(np.asarray(ours.default_time_ids), time_ids.numpy())

    noise = np.random.RandomState(2).randn(1, 4, 24, 24).astype(np.float32)
    x_ref = torch.from_numpy(noise.copy())
    with torch.no_grad():
        for step in ref.steps:
            x_ref = ref(
                x_ref,
                step=step,
                clip_text_embedding=ref_emb,
                pooled_text_embedding=ref_pooled,
                time_ids=time_ids,
                condition_scale=5.0,
            )
        image_ref = ref.lda.decode(x_ref).numpy()
    del ref
    gc.collect()

    x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))
    for step in ours.steps:
        x_our = ours(
            x_our,
            step,
            clip_text_embedding=our_emb,
            pooled_text_embedding=our_pooled,
            time_ids=ours.default_time_ids,
            condition_scale=5.0,
        )
    np.testing.assert_allclose(np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=2e-3)

    image_our = np.asarray(ours.lda.decode(x_our)).transpose(0, 3, 1, 2)
    mse = float(np.mean((np.clip(image_our, -1, 1) - np.clip(image_ref, -1, 1)) ** 2))
    psnr = 100.0 if mse == 0 else 10 * np.log10(4.0 / mse)
    assert psnr >= 43, f"PSNR {psnr:.2f} below threshold"
