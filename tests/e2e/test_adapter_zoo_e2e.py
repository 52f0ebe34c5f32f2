"""10-step full-pipeline e2e for the remaining adapter zoo.

Extends tests/e2e/test_adapter_pipeline_e2e.py (ControlNet, IP-Adapter) to
every §2.8 adapter the reference exercises at full step counts
(/root/reference/tests/e2e/test_diffusion.py:778-2659): T2I-Adapter, FreeU,
SAG, style-aligned, restart, IC-Light, ELLA, textual inversion. Shared random
weights, a 10-step DDIM trajectory at 256² with the adapter active every
step, final latents compared tightly and decoded images gated by the
reference similarity envelope. This is what single-forward parity misses:
scale schedules, context lifetimes and drift accumulated across steps.
"""

import gc

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available
from tests.utils import ensure_similar_images

pytestmark = [
    pytest.mark.skipif(not reference_available(), reason="reference package unavailable"),
    pytest.mark.slow,
]

_STEPS = 10


@pytest.fixture(scope="module")
def sd_pair():
    """Full-width SD1.5 (unet + lda real, CLIP stubbed — embeddings are fed
    directly) with converted shared random weights, 10-step DDIM."""
    torch.manual_seed(20)
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion import StableDiffusion_1 as RefSD
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import DDIM, StableDiffusion_1

    ref = RefSD(
        solver=RefDDIM(num_inference_steps=_STEPS),
        clip_text_encoder=rfl.Chain(rfl.Identity()),  # type: ignore[arg-type]
    )
    ref.unet.eval()
    ref.lda.eval()
    ours = StableDiffusion_1(
        solver=DDIM(num_inference_steps=_STEPS),
        clip_text_encoder=fl.Chain(fl.Identity()),  # type: ignore[arg-type]
    )
    load_reference_state_dict(ours.unet, {k: v.detach().numpy() for k, v in ref.unet.state_dict().items()})
    load_reference_state_dict(ours.lda, {k: v.detach().numpy() for k, v in ref.lda.state_dict().items()})
    yield ref, ours
    del ref, ours
    gc.collect()


@pytest.fixture()
def inputs():
    rs = np.random.RandomState(21)
    return (
        rs.randn(1, 4, 32, 32).astype(np.float32),  # noise (NCHW for torch)
        rs.randn(2, 77, 768).astype(np.float32),  # CFG embedding pair
    )


def _run_traj(ref, ours, noise, emb, scale=7.5, per_step_ref=None, per_step_our=None):
    """Run the 10-step trajectory on both sides; return decoded images after
    asserting tight latent agreement."""
    x_ref = torch.from_numpy(noise.copy())
    with torch.no_grad():
        for step in ref.steps:
            x_ref = ref(x_ref, step=step, clip_text_embedding=torch.from_numpy(emb.copy()), condition_scale=scale)
            if per_step_ref is not None:
                x_ref = per_step_ref(step, x_ref)
        image_ref = ref.lda.decode(x_ref).numpy()

    x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))
    for step in ours.steps:
        x_our = ours(x_our, step, clip_text_embedding=jnp.asarray(emb), condition_scale=scale)
        if per_step_our is not None:
            x_our = per_step_our(step, x_our)
    image_our = np.asarray(ours.lda.decode(x_our)).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=5e-3)
    return image_our, image_ref


def test_t2i_adapter_10_step_pipeline(sd_pair, inputs) -> None:
    torch.manual_seed(22)
    from refiners.foundationals.latent_diffusion import SD1T2IAdapter as RefT2I

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import SD1T2IAdapter

    ref, ours = sd_pair
    ref_adapter = RefT2I(ref.unet, name="pose", scale=0.8).inject()
    our_adapter = SD1T2IAdapter(ours.unet, name="pose", scale=0.8).inject()
    load_reference_state_dict(
        our_adapter.condition_encoder,
        {k: v.detach().numpy() for k, v in ref_adapter.condition_encoder.state_dict().items()},
    )
    condition = np.random.RandomState(23).rand(1, 3, 256, 256).astype(np.float32)
    try:
        with torch.no_grad():
            ref_feats = ref_adapter.compute_condition_features(torch.from_numpy(condition.copy()))
        our_feats = our_adapter.compute_condition_features(jnp.asarray(condition.transpose(0, 2, 3, 1)))
        ref_adapter.set_condition_features(ref_feats)
        our_adapter.set_condition_features(our_feats)
        image_our, image_ref = _run_traj(ref, ours, *inputs)
        ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    finally:
        ref_adapter.eject()
        our_adapter.eject()


def test_freeu_10_step_pipeline(sd_pair, inputs) -> None:
    from refiners.foundationals.latent_diffusion import SDFreeUAdapter as RefFreeU

    from refiners_tpu.foundationals.latent_diffusion import SDFreeUAdapter

    ref, ours = sd_pair
    scales = dict(backbone_scales=[1.2, 1.4], skip_scales=[0.9, 0.2])
    ref_adapter = RefFreeU(ref.unet, **scales).inject()
    our_adapter = SDFreeUAdapter(ours.unet, **scales).inject()
    try:
        image_our, image_ref = _run_traj(ref, ours, *inputs)
        ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    finally:
        ref_adapter.eject()
        our_adapter.eject()


def test_sag_10_step_pipeline(sd_pair, inputs) -> None:
    """SAG doubles the work per step (degraded-latent pass) — the adapter's
    blur/mask/renoise chain must track the reference across the trajectory."""
    ref, ours = sd_pair
    ref.set_self_attention_guidance(enable=True, scale=0.75)
    ours.set_self_attention_guidance(enable=True, scale=0.75)
    try:
        image_our, image_ref = _run_traj(ref, ours, *inputs)
        ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    finally:
        ref.set_self_attention_guidance(enable=False)
        ours.set_self_attention_guidance(enable=False)


def test_style_aligned_10_step_pipeline(sd_pair) -> None:
    """Batch-wise shared attention: 2 prompts style-aligned to the first."""
    from refiners.foundationals.latent_diffusion.style_aligned import StyleAlignedAdapter as RefAdapter

    from refiners_tpu.foundationals.latent_diffusion import StyleAlignedAdapter

    ref, ours = sd_pair
    ref_adapter = RefAdapter(ref.unet, scale=0.8).inject()
    our_adapter = StyleAlignedAdapter(ours.unet, scale=0.8).inject()
    rs = np.random.RandomState(24)
    noise = rs.randn(2, 4, 32, 32).astype(np.float32)
    emb = rs.randn(4, 77, 768).astype(np.float32)  # CFG pair × 2 images
    try:
        image_our, image_ref = _run_traj(ref, ours, noise, emb)
        ensure_similar_images(image_our[:1], image_ref[:1], min_psnr=35, min_ssim=0.98)
        ensure_similar_images(image_our[1:], image_ref[1:], min_psnr=35, min_ssim=0.98)
    finally:
        ref_adapter.eject()
        our_adapter.eject()


def test_restart_10_step_pipeline(sd_pair, inputs, monkeypatch) -> None:
    """Restart re-noises and repeats the trajectory tail mid-loop
    (reference flow: test_diffusion.py:2432-2467) with identical injected
    noise on both sides."""
    from refiners.foundationals.latent_diffusion.restart import Restart as RefRestart

    import refiners_tpu.foundationals.latent_diffusion.restart as restart_mod
    from refiners_tpu.foundationals.latent_diffusion.restart import Restart

    ref, ours = sd_pair
    ref_restart = RefRestart(ldm=ref, num_steps=4, num_iterations=1)
    our_restart = Restart(ldm=ours, num_steps=4, num_iterations=1)
    assert our_restart.start_step == ref_restart.start_step < _STEPS

    rs = np.random.RandomState(25)
    fixed_noise = [rs.randn(1, 4, 32, 32).astype(np.float32) for _ in range(4)]
    it_ref = iter(fixed_noise)
    monkeypatch.setattr(torch, "randn_like", lambda input, **kw: torch.from_numpy(next(it_ref).copy()))
    it_our = iter(fixed_noise)

    class _FakeRandom:
        @staticmethod
        def normal(key, shape, dtype=None):
            return jnp.asarray(next(it_our)).transpose(0, 2, 3, 1)

        @staticmethod
        def fold_in(key, i):
            return key

    monkeypatch.setattr(restart_mod.jax, "random", _FakeRandom)

    noise, emb = inputs

    def per_step_ref(step, x):
        if step == ref_restart.start_step:
            with torch.no_grad():
                return ref_restart(x, clip_text_embedding=torch.from_numpy(emb.copy()), condition_scale=7.5)
        return x

    def per_step_our(step, x):
        if step == our_restart.start_step:
            return our_restart(
                x, clip_text_embedding=jnp.asarray(emb), condition_scale=7.5, key=jnp.zeros((), jnp.uint32)
            )
        return x

    image_our, image_ref = _run_traj(ref, ours, noise, emb, per_step_ref=per_step_ref, per_step_our=per_step_our)
    ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)


def test_refonly_10_step_pipeline(sd_pair, inputs) -> None:
    """Reference-only control runs a guide pre-pass EVERY step with a
    freshly re-noised guide latent (reference flow:
    /root/reference/tests/e2e/test_diffusion.py:1699 test_diffusion_refonly) —
    the write-buffer contexts saved by the passthrough must have exactly
    one-step lifetimes across the trajectory, which single-forward parity
    (test_adapter_parity.py) cannot see."""
    from refiners.foundationals.latent_diffusion.reference_only_control import (
        ReferenceOnlyControlAdapter as RefAdapter,
    )

    from refiners_tpu.foundationals.latent_diffusion import ReferenceOnlyControlAdapter

    ref, ours = sd_pair
    ref_adapter = RefAdapter(ref.unet).inject()
    our_adapter = ReferenceOnlyControlAdapter(ours.unet).inject()

    noise, emb = inputs
    rs = np.random.RandomState(34)
    guide = rs.randn(1, 4, 32, 32).astype(np.float32)
    guide = np.concatenate([guide, guide])  # CFG pair, as the reference e2e does
    step_noises = [rs.randn(2, 4, 32, 32).astype(np.float32) for _ in range(_STEPS)]

    try:
        x_ref = torch.from_numpy(noise.copy())
        with torch.no_grad():
            for step in ref.steps:
                noised_guide = ref.solver.add_noise(
                    torch.from_numpy(guide.copy()), torch.from_numpy(step_noises[step].copy()), step
                )
                ref_adapter.set_controlnet_condition(noised_guide)
                x_ref = ref(
                    x_ref, step=step, clip_text_embedding=torch.from_numpy(emb.copy()), condition_scale=7.5
                )
            image_ref = ref.lda.decode(x_ref).numpy()

        guide_j = jnp.asarray(guide.transpose(0, 2, 3, 1))
        x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))
        for step in ours.steps:
            noised_guide = ours.solver.add_noise(
                guide_j, jnp.asarray(step_noises[step].transpose(0, 2, 3, 1)), step
            )
            our_adapter.set_controlnet_condition(noised_guide)
            x_our = ours(x_our, step, clip_text_embedding=jnp.asarray(emb), condition_scale=7.5)
        image_our = np.asarray(ours.lda.decode(x_our)).transpose(0, 3, 1, 2)

        np.testing.assert_allclose(np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=5e-3)
        ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    finally:
        ref_adapter.eject()
        our_adapter.eject()


def test_ella_10_step_pipeline(sd_pair, inputs) -> None:
    """ELLA swaps every cross-attention source to the timestep-aware
    resampler output. Random-init perceiver weights are damped (×0.2, both
    sides identically) — undamped random ELLA latents (std ~28) saturate the
    softmax into measured chaos (see test_adapter_parity.py noise-floor
    note), which would make ANY trajectory comparison vacuous."""
    torch.manual_seed(26)
    from refiners.foundationals.latent_diffusion.stable_diffusion_1.ella_adapter import (
        SD1ELLAAdapter as RefAdapter,
    )

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1 import SD1ELLAAdapter

    ref, ours = sd_pair
    ref_adapter = RefAdapter(ref.unet).inject()
    our_adapter = SD1ELLAAdapter(ours.unet).inject()
    damped = {k: (0.2 * v).detach().numpy() for k, v in ref_adapter.latents_encoder.state_dict().items()}
    with torch.no_grad():
        ref_adapter.latents_encoder.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in damped.items()})
    load_reference_state_dict(our_adapter.latents_encoder, damped)

    llm_emb = 0.2 * np.random.RandomState(27).randn(2, 12, 2048).astype(np.float32)
    try:
        ref_adapter.set_llm_text_embedding(torch.from_numpy(llm_emb.copy()))
        our_adapter.set_llm_text_embedding(jnp.asarray(llm_emb))
        image_our, image_ref = _run_traj(ref, ours, *inputs)
        ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    finally:
        ref_adapter.eject()
        our_adapter.eject()


def test_ic_light_10_step_pipeline() -> None:
    """IC-Light: patched 8-channel input conv + gray-composite latent concat
    every step (reference flow: test_diffusion.py:2659-2694). Patch applied
    as zero-at-init + one additive application of a shared random patch."""
    torch.manual_seed(28)
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion import SD1UNet as RefUNet, StableDiffusion_1 as RefSD
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM
    from refiners.foundationals.latent_diffusion.stable_diffusion_1.ic_light import ICLight as RefICLight
    from refiners.foundationals.latent_diffusion.stable_diffusion_1.model import SD1Autoencoder as RefLDA

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.conversion.refiners_compat import convert_refiners_state_dict, load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import DDIM, SD1UNet
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1 import SD1Autoencoder
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.ic_light import ICLight

    ref_unet = RefUNet(in_channels=4).eval()
    ref_lda = RefLDA().eval()
    our_unet = SD1UNet(in_channels=4)
    our_lda = SD1Autoencoder()
    load_reference_state_dict(our_unet, {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()})
    load_reference_state_dict(our_lda, {k: v.detach().numpy() for k, v in ref_lda.state_dict().items()})

    def zero_patch(sd: dict, conv_key: str, in_axis: int):
        out = {}
        for k, v in sd.items():
            shape = list(np.asarray(v).shape)
            if k == conv_key:
                shape[in_axis] = 8
            out[k] = np.zeros(shape, dtype=np.float32)
        return out

    conv_key = "DownBlocks.Chain_1.Conv2d.weight"
    ref_zero = zero_patch({k: v.detach().numpy() for k, v in ref_unet.state_dict().items()}, conv_key, 1)
    our_zero = zero_patch({k: np.asarray(v) for k, v in our_unet.state_dict().items()}, conv_key, 2)

    with torch.no_grad():
        ref_ic = RefICLight(
            patch_weights={k: torch.from_numpy(v.copy()) for k, v in ref_zero.items()},
            unet=ref_unet,
            lda=ref_lda,
            clip_text_encoder=rfl.Chain(rfl.Identity()),  # type: ignore[arg-type]
            solver=RefDDIM(num_inference_steps=_STEPS),
        )
    our_ic = ICLight(
        patch_weights={k: jnp.asarray(v) for k, v in our_zero.items()},
        unet=our_unet,
        lda=our_lda,
        clip_text_encoder=fl.Chain(fl.Identity()),  # type: ignore[arg-type]
        solver=DDIM(num_inference_steps=_STEPS),
    )

    # shared random patch over the EXTENDED shapes, applied additively
    g = np.random.RandomState(29)
    ref_patch = {
        k: (0.02 * g.randn(*v.shape)).astype(np.float32)
        for k, v in ref_ic.unet.state_dict().items()
    }
    with torch.no_grad():
        ref_ic._apply_patch({k: torch.from_numpy(v.copy()) for k, v in ref_patch.items()})
    our_ic._apply_patch(convert_refiners_state_dict(ref_patch, our_ic.unet))

    from PIL import Image

    img = Image.fromarray((g.rand(256, 256, 3) * 255).astype(np.uint8))
    mask = Image.fromarray((np.indices((256, 256)).sum(0) % 2 * 255).astype(np.uint8), mode="L")
    with torch.no_grad():
        ref_ic.set_ic_light_condition(RefICLight.compute_gray_composite(image=img, mask=mask))
    our_ic.set_ic_light_condition(ICLight.compute_gray_composite(image=img, mask=mask))

    rs = np.random.RandomState(30)
    noise = rs.randn(1, 4, 32, 32).astype(np.float32)
    emb = rs.randn(2, 77, 768).astype(np.float32)
    image_our, image_ref = _run_traj(ref_ic, our_ic, noise, emb, scale=2.0)
    ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    del ref_ic, our_ic
    gc.collect()


def test_textual_inversion_10_step_pipeline(sd_pair) -> None:
    """ConceptExtender path: new token embedding + tokenizer branch feed the
    full pipeline (reference flow: test_diffusion.py:1780-1809)."""
    torch.manual_seed(31)
    from pathlib import Path

    vocab = Path("/root/reference/src/refiners/foundationals/clip/bpe_simple_vocab_16e6.txt.gz")
    from refiners.foundationals.clip.concepts import ConceptExtender as RefExtender
    from refiners.foundationals.clip.text_encoder import CLIPTextEncoderL as RefCLIP

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.clip import CLIPTextEncoderL
    from refiners_tpu.foundationals.clip.concepts import ConceptExtender

    ref, ours = sd_pair
    ref_clip = RefCLIP().eval()
    our_clip = CLIPTextEncoderL()
    load_reference_state_dict(our_clip, {k: v.detach().numpy() for k, v in ref_clip.state_dict().items()})

    concept = np.random.RandomState(32).randn(768).astype(np.float32)
    ref_ext = RefExtender(ref_clip)
    ref_ext.add_concept("<test-artwork>", torch.from_numpy(concept.copy()))
    ref_ext.inject()
    our_ext = ConceptExtender(our_clip)
    our_ext.add_concept("<test-artwork>", jnp.asarray(concept))
    our_ext.inject()

    prompt = "a cute cat on a <test-artwork>"
    with torch.no_grad():
        ref_emb = ref_clip(prompt).numpy()
    our_emb = np.asarray(our_clip(prompt))
    np.testing.assert_allclose(our_emb, ref_emb, atol=1e-4)

    emb = np.concatenate([np.zeros_like(ref_emb), ref_emb])  # uncond + cond
    noise = np.random.RandomState(33).randn(1, 4, 32, 32).astype(np.float32)
    image_our, image_ref = _run_traj(ref, ours, noise, emb)
    ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)


def _ip_plus_pair(sd_pair, fine_grained: bool, seed: int):
    """(ref_adapter, our_adapter) IP-Adapter pair on the shared UNets with a
    REAL reduced CLIP image encoder — the embedding path (grid features +
    PerceiverResampler or ImageProjection) actually executes, unlike the
    stubbed pipeline test (VERDICT r4 item 2). 32 encoder layers because the
    reference's convert_to_grid_features pins the ViT-H layer count
    (reference image_prompt.py:562); dims are tiny so it stays cheap."""
    torch.manual_seed(seed)
    from refiners.foundationals.clip.image_encoder import CLIPImageEncoder as RefEnc
    from refiners.foundationals.latent_diffusion import SD1IPAdapter as RefIP

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.clip.image_encoder import CLIPImageEncoder
    from refiners_tpu.foundationals.latent_diffusion import SD1IPAdapter

    ref, ours = sd_pair
    enc_kwargs = dict(
        image_size=32,
        embedding_dim=64,
        output_dim=48,
        patch_size=16,
        num_layers=32 if fine_grained else 2,
        num_attention_heads=4,
        feedforward_dim=128,
    )
    ref_enc = RefEnc(**enc_kwargs).eval()
    our_enc = CLIPImageEncoder(**enc_kwargs)
    load_reference_state_dict(our_enc, {k: v.detach().numpy() for k, v in ref_enc.state_dict().items()})

    ref_adapter = RefIP(ref.unet, clip_image_encoder=ref_enc, fine_grained=fine_grained).inject()  # type: ignore[arg-type]
    our_adapter = SD1IPAdapter(ours.unet, clip_image_encoder=our_enc, fine_grained=fine_grained).inject()  # type: ignore[arg-type]
    load_reference_state_dict(
        our_adapter.image_proj,
        {k: v.detach().numpy() for k, v in ref_adapter.image_proj.state_dict().items()},
    )
    for ref_sub, our_sub in zip(ref_adapter.sub_adapters, our_adapter.sub_adapters):
        load_reference_state_dict(
            our_sub.image_cross_attention,
            {k: v.detach().numpy() for k, v in ref_sub.image_cross_attention.state_dict().items()},
        )
    return ref_adapter, our_adapter


def test_ip_adapter_plus_10_step_pipeline(sd_pair, inputs) -> None:
    """Fine-grained (plus) IP-Adapter: grid encoder → PerceiverResampler →
    injected image cross-attention over the full 10-step trajectory
    (reference e2e: test_diffusion.py:2045)."""
    ref, ours = sd_pair
    ref_adapter, our_adapter = _ip_plus_pair(sd_pair, fine_grained=True, seed=40)
    image = np.random.RandomState(41).randn(1, 3, 32, 32).astype(np.float32)
    try:
        with torch.no_grad():
            ref_emb = ref_adapter.compute_clip_image_embedding(torch.from_numpy(image.copy()))
            ref_adapter.set_clip_image_embedding(ref_emb)
        our_emb = our_adapter.compute_clip_image_embedding(jnp.asarray(image.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(our_emb), ref_emb.numpy(), atol=1e-4)
        our_adapter.set_clip_image_embedding(our_emb)
        image_our, image_ref = _run_traj(ref, ours, *inputs)
        ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    finally:
        ref_adapter.eject()
        our_adapter.eject()


def test_ip_adapter_multi_image_10_step_pipeline(sd_pair, inputs) -> None:
    """Multi-image IP-Adapter: two weighted image prompts concatenated into a
    longer token sequence drive the trajectory (reference e2e:
    test_diffusion.py:1900)."""
    ref, ours = sd_pair
    ref_adapter, our_adapter = _ip_plus_pair(sd_pair, fine_grained=False, seed=42)
    images = np.random.RandomState(43).randn(2, 3, 32, 32).astype(np.float32)
    weights = [1.0, 0.6]
    try:
        with torch.no_grad():
            ref_emb = ref_adapter.compute_clip_image_embedding(
                torch.from_numpy(images.copy()), weights=weights
            )
            ref_adapter.set_clip_image_embedding(ref_emb)
        our_emb = our_adapter.compute_clip_image_embedding(
            jnp.asarray(images.transpose(0, 2, 3, 1)), weights=weights
        )
        np.testing.assert_allclose(np.asarray(our_emb), ref_emb.numpy(), atol=1e-4)
        our_adapter.set_clip_image_embedding(our_emb)
        image_our, image_ref = _run_traj(ref, ours, *inputs)
        ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    finally:
        ref_adapter.eject()
        our_adapter.eject()
