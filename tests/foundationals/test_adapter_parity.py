"""Numeric forward parity of SD adapters vs the reference on shared UNets.

One (reference, ours) SD1UNet pair with converted random weights; each test
injects an adapter on both sides, compares a forward pass, then ejects and
re-checks the base output — covering both the math and the surgery.
"""

import gc

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = [
    pytest.mark.skipif(not reference_available(), reason="reference package unavailable"),
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def unet_pair():
    torch.manual_seed(0)
    from refiners.foundationals.latent_diffusion import SD1UNet as RefUNet

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import SD1UNet

    ref = RefUNet(in_channels=4).eval()
    ours = SD1UNet(in_channels=4)
    load_reference_state_dict(ours, {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    return ref, ours


def _run_pair(ref, ours, x: np.ndarray, text: np.ndarray, timestep: int) -> tuple[np.ndarray, np.ndarray]:
    t = torch.tensor([timestep])
    with torch.no_grad():
        ref.set_timestep(t)
        ref.set_clip_text_embedding(torch.from_numpy(text.copy()))
        expected = ref(torch.from_numpy(x.copy())).numpy()
    ours.set_timestep(jnp.asarray([timestep]))
    ours.set_clip_text_embedding(jnp.asarray(text))
    got = np.asarray(ours(jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    return got, expected


@pytest.fixture(scope="module")
def inputs():
    rs = np.random.RandomState(1)
    return (
        rs.randn(1, 4, 16, 16).astype(np.float32),
        rs.randn(1, 77, 768).astype(np.float32),
    )


def test_base_unet_parity(unet_pair, inputs) -> None:
    got, expected = _run_pair(*unet_pair, *inputs, timestep=123)
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_freeu_parity(unet_pair, inputs) -> None:
    from refiners.foundationals.latent_diffusion import SDFreeUAdapter as RefFreeU

    from refiners_tpu.foundationals.latent_diffusion import SDFreeUAdapter

    ref, ours = unet_pair
    ref_adapter = RefFreeU(ref, backbone_scales=[1.2, 1.4], skip_scales=[0.9, 0.2]).inject()
    our_adapter = SDFreeUAdapter(ours, backbone_scales=[1.2, 1.4], skip_scales=[0.9, 0.2]).inject()
    try:
        got, expected = _run_pair(ref, ours, *inputs, timestep=321)
        np.testing.assert_allclose(got, expected, atol=5e-4)
    finally:
        ref_adapter.eject()
        our_adapter.eject()


def test_t2i_adapter_parity(unet_pair, inputs) -> None:
    torch.manual_seed(2)
    from refiners.foundationals.latent_diffusion import SD1T2IAdapter as RefT2I

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import SD1T2IAdapter

    ref, ours = unet_pair
    ref_adapter = RefT2I(ref, name="pose").inject()
    our_adapter = SD1T2IAdapter(ours, name="pose").inject()
    load_reference_state_dict(
        our_adapter.condition_encoder,
        {k: v.detach().numpy() for k, v in ref_adapter.condition_encoder.state_dict().items()},
    )
    condition = np.random.RandomState(3).randn(1, 3, 128, 128).astype(np.float32)
    try:
        with torch.no_grad():
            ref_feats = ref_adapter.compute_condition_features(torch.from_numpy(condition.copy()))
        our_feats = our_adapter.compute_condition_features(jnp.asarray(condition.transpose(0, 2, 3, 1)))
        for rf, of in zip(ref_feats, our_feats):
            np.testing.assert_allclose(
                np.asarray(of).transpose(0, 3, 1, 2), rf.numpy(), atol=5e-4
            )
        ref_adapter.set_condition_features(ref_feats)
        our_adapter.set_condition_features(our_feats)
        got, expected = _run_pair(ref, ours, *inputs, timestep=77)
        np.testing.assert_allclose(got, expected, atol=1e-3)
    finally:
        ref_adapter.eject()
        our_adapter.eject()


def test_ip_adapter_parity(unet_pair, inputs) -> None:
    torch.manual_seed(4)
    from refiners.foundationals.latent_diffusion import SD1IPAdapter as RefIP
    from refiners.foundationals.clip.image_encoder import CLIPImageEncoderH as RefH

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import SD1IPAdapter

    ref, ours = unet_pair

    # tiny encoder stand-ins: the embedding context is injected directly
    ref_enc = RefH.__new__(RefH)
    torch.nn.Module.__init__(ref_enc)
    import refiners.fluxion.layers as rfl

    rfl.Chain.__init__(ref_enc)
    ref_enc.embedding_dim = 1280
    ref_enc.output_dim = 1024

    our_enc = fl.Chain()
    our_enc.embedding_dim = 1280  # type: ignore[attr-defined]
    our_enc.output_dim = 1024  # type: ignore[attr-defined]

    ref_adapter = RefIP(ref, clip_image_encoder=ref_enc).inject()
    our_adapter = SD1IPAdapter(ours, clip_image_encoder=our_enc).inject()  # type: ignore[arg-type]

    # transfer the reference's randomly-initialized projection + K/V weights
    load_reference_state_dict(
        our_adapter.image_proj,
        {k: v.detach().numpy() for k, v in ref_adapter.image_proj.state_dict().items()},
    )
    for ref_sub, our_sub in zip(ref_adapter.sub_adapters, our_adapter.sub_adapters):
        load_reference_state_dict(
            our_sub.image_cross_attention,
            {k: v.detach().numpy() for k, v in ref_sub.image_cross_attention.state_dict().items()},
        )

    image_emb = np.random.RandomState(5).randn(1, 4, 768).astype(np.float32)
    try:
        ref_adapter.set_clip_image_embedding(torch.from_numpy(image_emb.copy()))
        our_adapter.set_clip_image_embedding(jnp.asarray(image_emb))
        got, expected = _run_pair(ref, ours, *inputs, timestep=55)
        np.testing.assert_allclose(got, expected, atol=1e-3)
    finally:
        ref_adapter.eject()
        our_adapter.eject()


def test_sag_parity(unet_pair, inputs) -> None:
    from refiners.foundationals.latent_diffusion import SD1UNet  # noqa: F401
    from refiners.foundationals.latent_diffusion.stable_diffusion_1.self_attention_guidance import (
        SD1SAGAdapter as RefSAG,
    )

    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1 import SD1SAGAdapter

    ref, ours = unet_pair
    ref_adapter = RefSAG(ref).inject()
    our_adapter = SD1SAGAdapter(ours).inject()
    x, text = inputs
    # SAG captures the middle-block attention map; CFG batch of 2
    x2 = np.concatenate([x, x])
    text2 = np.concatenate([text, text])
    try:
        got, expected = _run_pair(ref, ours, x2, text2, timestep=99)
        np.testing.assert_allclose(got, expected, atol=5e-4)

        # degraded latents path
        from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

        from refiners_tpu.foundationals.latent_diffusion import DDIM

        noise = np.random.RandomState(7).randn(1, 4, 16, 16).astype(np.float32)
        with torch.no_grad():
            ref_deg = ref_adapter.compute_degraded_latents(
                RefDDIM(num_inference_steps=10),
                torch.from_numpy(x.copy()),
                torch.from_numpy(noise.copy()),
                step=3,
            ).numpy()
        our_deg = np.asarray(
            our_adapter.compute_degraded_latents(
                DDIM(num_inference_steps=10),
                jnp.asarray(x.transpose(0, 2, 3, 1)),
                jnp.asarray(noise.transpose(0, 2, 3, 1)),
                step=3,
            )
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(our_deg, ref_deg, atol=1e-3)
    finally:
        ref_adapter.eject()
        our_adapter.eject()


def test_base_output_restored_after_all(unet_pair, inputs) -> None:
    got, expected = _run_pair(*unet_pair, *inputs, timestep=123)
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_ella_adapter_parity(unet_pair, inputs) -> None:
    torch.manual_seed(6)
    from refiners.foundationals.latent_diffusion.ella_adapter import ELLA as RefELLA
    from refiners.foundationals.latent_diffusion.stable_diffusion_1.ella_adapter import (
        SD1ELLAAdapter as RefAdapter,
    )

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1 import SD1ELLAAdapter

    ref, ours = unet_pair
    ref_adapter = RefAdapter(ref).inject()
    our_adapter = SD1ELLAAdapter(ours).inject()
    load_reference_state_dict(
        our_adapter.latents_encoder,
        {k: v.detach().numpy() for k, v in ref_adapter.latents_encoder.state_dict().items()},
    )
    llm_emb = np.random.RandomState(8).randn(1, 12, 2048).astype(np.float32)
    try:
        ref_adapter.set_llm_text_embedding(torch.from_numpy(llm_emb.copy()))
        our_adapter.set_llm_text_embedding(jnp.asarray(llm_emb))

        # Tight parity on the latents encoder itself (the ELLA-specific compute).
        with torch.no_grad():
            ref.set_timestep(torch.tensor([200]))
            ref_lat_in = torch.from_numpy(llm_emb.copy())
            ref_enc = ref_adapter.latents_encoder
            ref_enc.set_context("adapted_cross_attention_block", {"llm_text_embedding": ref_lat_in})

        got, expected = _run_pair(ref, ours, *inputs, timestep=200)
        ref_lat = ref.use_context("ella")["latents"].detach().numpy()
        our_lat = np.asarray(ours.use_context("ella")["latents"])
        np.testing.assert_allclose(our_lat, ref_lat, atol=1e-4)

        # The random-weight ELLA config is chaotic: its latents (std ~28) saturate
        # the cross-attention softmax, so the reference itself diverges by ~0.11
        # from a 2e-6 input perturbation. Full-output parity is therefore bounded
        # by that measured noise floor, not by fp tolerance.
        np.testing.assert_allclose(got, expected, atol=0.2)
        assert len(our_adapter.sub_adapters) == len(ref_adapter.sub_adapters) == 32
    finally:
        ref_adapter.eject()
        our_adapter.eject()

    # After eject the UNet must be numerically back to the base model (tight).
    got, expected = _run_pair(ref, ours, *inputs, timestep=200)
    np.testing.assert_allclose(got, expected, atol=1e-3)


def test_reference_only_control_parity(unet_pair, inputs) -> None:
    from refiners.foundationals.latent_diffusion.reference_only_control import (
        ReferenceOnlyControlAdapter as RefAdapter,
    )

    from refiners_tpu.foundationals.latent_diffusion import ReferenceOnlyControlAdapter

    ref, ours = unet_pair
    ref_adapter = RefAdapter(ref).inject()
    our_adapter = ReferenceOnlyControlAdapter(ours).inject()
    x, text = inputs
    x2 = np.concatenate([x, x])  # CFG pair expected
    text2 = np.concatenate([text, text])
    guide = np.random.RandomState(9).randn(1, 4, 16, 16).astype(np.float32)
    guide = np.concatenate([guide, guide])  # batch-2 guide, like the reference e2e test
    try:
        ref_adapter.set_controlnet_condition(torch.from_numpy(guide.copy()))
        our_adapter.set_controlnet_condition(jnp.asarray(guide.transpose(0, 2, 3, 1)))
        got, expected = _run_pair(ref, ours, x2, text2, timestep=88)
        np.testing.assert_allclose(got, expected, atol=1e-3)
    finally:
        ref_adapter.eject()
        our_adapter.eject()


def test_style_aligned_parity(unet_pair, inputs) -> None:
    from refiners.foundationals.latent_diffusion.style_aligned import StyleAlignedAdapter as RefAdapter

    from refiners_tpu.foundationals.latent_diffusion import StyleAlignedAdapter

    ref, ours = unet_pair
    ref_adapter = RefAdapter(ref, scale=0.7).inject()
    our_adapter = StyleAlignedAdapter(ours, scale=0.7).inject()
    rs = np.random.RandomState(10)
    x4 = rs.randn(4, 4, 16, 16).astype(np.float32)  # 2 cond + 2 uncond
    text4 = rs.randn(4, 77, 768).astype(np.float32)
    try:
        got, expected = _run_pair(ref, ours, x4, text4, timestep=42)
        np.testing.assert_allclose(got, expected, atol=1e-3)
    finally:
        ref_adapter.eject()
        our_adapter.eject()
