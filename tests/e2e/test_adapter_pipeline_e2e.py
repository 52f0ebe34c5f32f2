"""Full-pipeline adapter e2e: accumulated drift WITH adapters injected.

The single-forward adapter parity tests bound one-step error; the reference's
e2e tier instead runs whole pipelines with adapters active
(/root/reference/tests/e2e/test_diffusion.py: test_diffusion_controlnet ~:778,
test_diffusion_ip_adapter). Offline equivalents: shared random weights, a
10-step DDIM trajectory at 256² with the adapter conditioning every step, and
the final decoded images gated by the reference similarity envelope.
"""

import gc

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available
from tests.utils import ensure_similar_images

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")

_STEPS = 10


def _decode_ref(ref, x: "torch.Tensor") -> np.ndarray:
    with torch.no_grad():
        return ref.lda.decode(x).numpy()


@pytest.mark.slow
def test_controlnet_10_step_pipeline_matches_reference() -> None:
    torch.manual_seed(11)
    from refiners.foundationals.latent_diffusion import (
        SD1ControlnetAdapter as RefAdapter,
        StableDiffusion_1 as RefSD,
    )
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import (
        DDIM,
        SD1ControlnetAdapter,
        StableDiffusion_1,
    )

    ref = RefSD(solver=RefDDIM(num_inference_steps=_STEPS))
    ref.unet.eval()
    ref.lda.eval()
    ref_adapter = RefAdapter(ref.unet, name="canny").inject()

    ours = StableDiffusion_1(solver=DDIM(num_inference_steps=_STEPS))
    our_adapter = SD1ControlnetAdapter(ours.unet, name="canny").inject()
    # one transfer covers base + injected controlnet weights (same tree paths)
    load_reference_state_dict(ours.unet, {k: v.detach().numpy() for k, v in ref.unet.state_dict().items()})
    load_reference_state_dict(ours.lda, {k: v.detach().numpy() for k, v in ref.lda.state_dict().items()})

    rs = np.random.RandomState(1)
    noise = rs.randn(1, 4, 32, 32).astype(np.float32)
    emb = rs.randn(2, 77, 768).astype(np.float32)  # CFG pair, CLIP skipped
    condition = rs.rand(1, 3, 256, 256).astype(np.float32)

    x_ref = torch.from_numpy(noise.copy())
    with torch.no_grad():
        ref_adapter.set_controlnet_condition(torch.from_numpy(condition.copy()))
        for step in ref.steps:
            x_ref = ref(
                x_ref, step=step, clip_text_embedding=torch.from_numpy(emb.copy()), condition_scale=7.5
            )
        image_ref = _decode_ref(ref, x_ref)
    del ref, ref_adapter
    gc.collect()

    our_adapter.set_controlnet_condition(jnp.asarray(condition.transpose(0, 2, 3, 1)))
    x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))
    for step in ours.steps:
        x_our = ours(x_our, step, clip_text_embedding=jnp.asarray(emb), condition_scale=7.5)
    image_our = np.asarray(ours.lda.decode(x_our)).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=5e-3)
    ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)


@pytest.mark.slow
def test_ip_adapter_10_step_pipeline_matches_reference() -> None:
    torch.manual_seed(12)
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.clip.image_encoder import CLIPImageEncoderH as RefH
    from refiners.foundationals.latent_diffusion import (
        SD1IPAdapter as RefIP,
        StableDiffusion_1 as RefSD,
    )
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import DDIM, SD1IPAdapter, StableDiffusion_1

    ref = RefSD(solver=RefDDIM(num_inference_steps=_STEPS))
    ref.unet.eval()
    ref.lda.eval()

    # encoder stand-ins: the CLIP-image embedding is injected directly
    ref_enc = RefH.__new__(RefH)
    torch.nn.Module.__init__(ref_enc)
    rfl.Chain.__init__(ref_enc)
    ref_enc.embedding_dim = 1280
    ref_enc.output_dim = 1024
    our_enc = fl.Chain()
    our_enc.embedding_dim = 1280  # type: ignore[attr-defined]
    our_enc.output_dim = 1024  # type: ignore[attr-defined]

    ref_adapter = RefIP(ref.unet, clip_image_encoder=ref_enc).inject()

    ours = StableDiffusion_1(solver=DDIM(num_inference_steps=_STEPS))
    our_adapter = SD1IPAdapter(ours.unet, clip_image_encoder=our_enc).inject()  # type: ignore[arg-type]

    load_reference_state_dict(ours.lda, {k: v.detach().numpy() for k, v in ref.lda.state_dict().items()})
    load_reference_state_dict(ours.unet, {k: v.detach().numpy() for k, v in ref.unet.state_dict().items()})
    load_reference_state_dict(
        our_adapter.image_proj,
        {k: v.detach().numpy() for k, v in ref_adapter.image_proj.state_dict().items()},
    )
    for ref_sub, our_sub in zip(ref_adapter.sub_adapters, our_adapter.sub_adapters):
        load_reference_state_dict(
            our_sub.image_cross_attention,
            {k: v.detach().numpy() for k, v in ref_sub.image_cross_attention.state_dict().items()},
        )

    rs = np.random.RandomState(2)
    noise = rs.randn(1, 4, 32, 32).astype(np.float32)
    emb = rs.randn(2, 77, 768).astype(np.float32)
    image_emb = rs.randn(1, 4, 768).astype(np.float32)  # post-projection tokens
    cfg_image_emb = np.concatenate([np.zeros_like(image_emb), image_emb])

    x_ref = torch.from_numpy(noise.copy())
    with torch.no_grad():
        ref_adapter.set_clip_image_embedding(torch.from_numpy(cfg_image_emb.copy()))
        for step in ref.steps:
            x_ref = ref(
                x_ref, step=step, clip_text_embedding=torch.from_numpy(emb.copy()), condition_scale=7.5
            )
        image_ref = _decode_ref(ref, x_ref)
    del ref, ref_adapter
    gc.collect()

    our_adapter.set_clip_image_embedding(jnp.asarray(cfg_image_emb))
    x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))
    for step in ours.steps:
        x_our = ours(x_our, step, clip_text_embedding=jnp.asarray(emb), condition_scale=7.5)
    image_our = np.asarray(ours.lda.decode(x_our)).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=5e-3)
    ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
