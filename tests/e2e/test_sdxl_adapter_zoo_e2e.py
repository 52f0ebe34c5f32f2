"""10-step full-pipeline e2e for the SDXL adapter zoo.

Closes the last reference e2e rows without a repo analog
(/root/reference/tests/e2e/test_diffusion.py): SDXL IP-Adapter (:2008),
SDXL IP-Adapter plus (:2086), SDXL SAG (:2249 sibling :2272), SDXL T2I
canny (:2384), and SDXL multiple LoRAs (:1621). Same recipe as the SD1.5
zoo tier (test_adapter_zoo_e2e.py): full-width SDXL UNet + VAE with shared
random weights, CLIP stubbed (embeddings fed directly), a 10-step DDIM CFG
trajectory at 192² with the adapter active every step, final latents
compared tightly and decoded images gated by the reference similarity
envelope.
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
_LATENT = 24  # 192² images


@pytest.fixture(scope="module")
def sdxl_pair():
    """Full-width SDXL (unet + lda real, CLIP stubbed) with converted shared
    random weights, 10-step DDIM."""
    torch.manual_seed(80)
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion import StableDiffusion_XL as RefSDXL
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import DDIM
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import StableDiffusion_XL

    ref = RefSDXL(
        solver=RefDDIM(num_inference_steps=_STEPS),
        clip_text_encoder=rfl.Chain(rfl.Identity()),  # type: ignore[arg-type]
    )
    ref.unet.eval()
    ref.lda.eval()
    ours = StableDiffusion_XL(
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
    rs = np.random.RandomState(81)
    return (
        rs.randn(1, 4, _LATENT, _LATENT).astype(np.float32),  # noise (NCHW for torch)
        rs.randn(2, 77, 2048).astype(np.float32),  # CFG embedding pair
        rs.randn(2, 1280).astype(np.float32),  # pooled CFG pair
    )


def _run_traj(ref, ours, noise, emb, pooled, scale=5.0):
    """Run the 10-step CFG trajectory on both sides; return decoded images
    after asserting tight latent agreement."""
    time_ids_ref = ref.default_time_ids
    x_ref = torch.from_numpy(noise.copy())
    with torch.no_grad():
        for step in ref.steps:
            x_ref = ref(
                x_ref,
                step=step,
                clip_text_embedding=torch.from_numpy(emb.copy()),
                pooled_text_embedding=torch.from_numpy(pooled.copy()),
                time_ids=time_ids_ref,
                condition_scale=scale,
            )
        image_ref = ref.lda.decode(x_ref).numpy()

    x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))
    for step in ours.steps:
        x_our = ours(
            x_our,
            step,
            clip_text_embedding=jnp.asarray(emb),
            pooled_text_embedding=jnp.asarray(pooled),
            time_ids=ours.default_time_ids,
            condition_scale=scale,
        )
    image_our = np.asarray(ours.lda.decode(x_our)).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=5e-3)
    return image_our, image_ref


def test_sdxl_sag_10_step_pipeline(sdxl_pair, inputs) -> None:
    """SDXL self-attention guidance across the trajectory (reference e2e:
    test_diffusion.py:2272 test_diffusion_sdxl_random_init_sag)."""
    ref, ours = sdxl_pair
    ref.set_self_attention_guidance(enable=True, scale=0.75)
    ours.set_self_attention_guidance(enable=True, scale=0.75)
    try:
        image_our, image_ref = _run_traj(ref, ours, *inputs)
        ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    finally:
        ref.set_self_attention_guidance(enable=False)
        ours.set_self_attention_guidance(enable=False)


def test_sdxl_t2i_adapter_10_step_pipeline(sdxl_pair, inputs) -> None:
    """SDXL T2I-Adapter condition pyramid (16× unshuffle) injected every step
    (reference e2e: test_diffusion.py:2384 test_t2i_adapter_xl_canny)."""
    torch.manual_seed(82)
    from refiners.foundationals.latent_diffusion import SDXLT2IAdapter as RefT2I

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.t2i_adapter import SDXLT2IAdapter

    ref, ours = sdxl_pair
    ref_adapter = RefT2I(ref.unet, name="canny", scale=0.8).inject()
    our_adapter = SDXLT2IAdapter(ours.unet, name="canny", scale=0.8).inject()
    load_reference_state_dict(
        our_adapter.condition_encoder,
        {k: v.detach().numpy() for k, v in ref_adapter.condition_encoder.state_dict().items()},
    )
    condition = np.random.RandomState(83).rand(1, 3, 8 * _LATENT, 8 * _LATENT).astype(np.float32)
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


def _sdxl_ip_pair(sdxl_pair, fine_grained: bool, seed: int):
    """(ref_adapter, our_adapter) SDXL IP-Adapter pair with a REAL reduced
    CLIP image encoder so the embedding path executes. For the plus variant a
    small explicit PerceiverResampler is passed on both sides (the default is
    the full-size 20-head/1280-latent ViT-H geometry)."""
    torch.manual_seed(seed)
    from refiners.foundationals.clip.image_encoder import CLIPImageEncoder as RefEnc
    from refiners.foundationals.latent_diffusion import SDXLIPAdapter as RefIP
    from refiners.foundationals.latent_diffusion.image_prompt import PerceiverResampler as RefResampler

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.clip.image_encoder import CLIPImageEncoder
    from refiners_tpu.foundationals.latent_diffusion.image_prompt import PerceiverResampler
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.image_prompt import SDXLIPAdapter

    ref, ours = sdxl_pair
    enc_kwargs = dict(
        image_size=32,
        embedding_dim=64,
        output_dim=48,
        patch_size=16,
        num_layers=32 if fine_grained else 2,  # convert_to_grid_features pins the ViT-H layer count
        num_attention_heads=4,
        feedforward_dim=128,
    )
    ref_enc = RefEnc(**enc_kwargs).eval()
    our_enc = CLIPImageEncoder(**enc_kwargs)
    load_reference_state_dict(our_enc, {k: v.detach().numpy() for k, v in ref_enc.state_dict().items()})

    proj_kwargs = dict(
        latents_dim=64,
        num_attention_layers=2,
        num_attention_heads=4,
        head_dim=16,
        num_tokens=8,
        input_dim=enc_kwargs["embedding_dim"],
        output_dim=2048,
    )
    ref_proj = RefResampler(**proj_kwargs).eval() if fine_grained else None
    our_proj = PerceiverResampler(**proj_kwargs) if fine_grained else None

    ref_adapter = RefIP(
        ref.unet, clip_image_encoder=ref_enc, image_proj=ref_proj, fine_grained=fine_grained
    ).inject()  # type: ignore[arg-type]
    our_adapter = SDXLIPAdapter(
        ours.unet, clip_image_encoder=our_enc, image_proj=our_proj, fine_grained=fine_grained
    ).inject()  # type: ignore[arg-type]
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


@pytest.mark.parametrize("fine_grained", [False, True], ids=["standard", "plus"])
def test_sdxl_ip_adapter_10_step_pipeline(sdxl_pair, inputs, fine_grained: bool) -> None:
    """SDXL IP-Adapter (ImageProjection / PerceiverResampler plus) over the
    full trajectory (reference e2e: test_diffusion.py:2008, :2086)."""
    ref, ours = sdxl_pair
    ref_adapter, our_adapter = _sdxl_ip_pair(sdxl_pair, fine_grained=fine_grained, seed=84 + fine_grained)
    image = np.random.RandomState(85).randn(1, 3, 32, 32).astype(np.float32)
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


def test_sdxl_multiple_loras_10_step(sdxl_pair, inputs) -> None:
    """Two named kohya LoRAs at different scales on the SDXL UNet drive the
    trajectory (reference e2e: test_diffusion.py:1621
    test_diffusion_sdxl_multiple_loras). Keys are synthesized in walk order
    over the reference UNet's cross-attention Linears (unique prefixes, so
    sorted order equals walk order on both sides)."""
    from refiners.foundationals.latent_diffusion.lora import SDLoraManager as RefManager

    from refiners_tpu.foundationals.latent_diffusion import SDLoraManager

    ref, ours = sdxl_pair

    def make_lora(seed: int, rank: int) -> dict[str, np.ndarray]:
        import refiners.fluxion.layers as rfl
        from refiners.foundationals.latent_diffusion.cross_attention import CrossAttentionBlock

        rs = np.random.RandomState(seed)
        sd: dict[str, np.ndarray] = {}
        n = 0
        for block in ref.unet.layers(CrossAttentionBlock):
            for linear in block.layers(rfl.Linear):
                d_out, d_in = linear.weight.shape
                base = f"lora_unet_L{n:04d}"
                sd[f"{base}.lora_down.weight"] = rs.randn(rank, d_in).astype(np.float32) * 0.1
                sd[f"{base}.lora_up.weight"] = rs.randn(d_out, rank).astype(np.float32) * 0.1
                n += 1
        return sd

    lora_a = make_lora(seed=86, rank=4)
    lora_b = make_lora(seed=87, rank=2)
    kwargs = dict(unet_inclusions=["CrossAttentionBlock"])
    ref_mgr = RefManager(ref)
    our_mgr = SDLoraManager(ours)
    try:
        ref_mgr.add_loras("style", tensors={k: torch.from_numpy(v.copy()) for k, v in lora_a.items()}, scale=0.9, **kwargs)
        our_mgr.add_loras("style", tensors={k: jnp.asarray(v) for k, v in lora_a.items()}, scale=0.9, **kwargs)
        ref_mgr.add_loras("subject", tensors={k: torch.from_numpy(v.copy()) for k, v in lora_b.items()}, scale=0.6, **kwargs)
        our_mgr.add_loras("subject", tensors={k: jnp.asarray(v) for k, v in lora_b.items()}, scale=0.6, **kwargs)
        assert set(our_mgr.names) == {"style", "subject"}
        image_our, image_ref = _run_traj(ref, ours, *inputs)
        ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    finally:
        ref_mgr.remove_all()
        our_mgr.remove_all()
