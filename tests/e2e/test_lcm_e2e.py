"""4-step LCM trajectory e2e vs the reference.

Counterparts of /root/reference/tests/e2e/test_lcm.py (test_lcm_base,
test_lcm_lora_with_guidance) with shared random weights at reduced
resolution: the LCMSolver's skip/denoise split, the SDXLLcmAdapter's
condition-scale embedding path and the LCM-LoRA projection attach must all
track the reference across a full multi-step trajectory — the drift that
single-forward parity (tests/foundationals/test_ic_light_lcm.py,
test_lcm_lora.py) cannot see.
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

_STEPS = 4
_LATENT = 24  # 192² images, same as the SDXL 30-step envelope


@pytest.fixture(scope="module")
def sdxl_pair():
    """Full-width SDXL (unet + lda real, CLIP stubbed — embeddings fed
    directly) with converted shared random weights, 4-step LCM solver."""
    torch.manual_seed(30)
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion import StableDiffusion_XL as RefSDXL
    from refiners.foundationals.latent_diffusion.solvers import LCMSolver as RefLCMSolver

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import LCMSolver
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import StableDiffusion_XL

    ref = RefSDXL(
        solver=RefLCMSolver(num_inference_steps=_STEPS),
        clip_text_encoder=rfl.Chain(rfl.Identity()),  # type: ignore[arg-type]
    )
    ref.unet.eval()
    ref.lda.eval()
    ours = StableDiffusion_XL(
        solver=LCMSolver(num_inference_steps=_STEPS),
        clip_text_encoder=fl.Chain(fl.Identity()),  # type: ignore[arg-type]
    )
    load_reference_state_dict(ours.unet, {k: v.detach().numpy() for k, v in ref.unet.state_dict().items()})
    load_reference_state_dict(ours.lda, {k: v.detach().numpy() for k, v in ref.lda.state_dict().items()})
    yield ref, ours
    del ref, ours
    gc.collect()


def _run_traj(ref, ours, noise, emb, pooled, scale):
    """Run the LCM trajectory on both sides; return decoded images after
    asserting tight latent agreement. `emb`/`pooled` carry the CFG pair
    (2, …) or the single conditioning (1, …) depending on the model's
    classifier_free_guidance flag."""
    x_ref = torch.from_numpy(noise.copy())
    with torch.no_grad():
        for step in ref.steps:
            x_ref = ref(
                x_ref,
                step=step,
                clip_text_embedding=torch.from_numpy(emb.copy()),
                pooled_text_embedding=torch.from_numpy(pooled.copy()),
                time_ids=ref.default_time_ids,
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


def test_lcm_base_4_step_pipeline(sdxl_pair) -> None:
    """Standard LCM: no CFG, condition scale lives in the adapter's
    sinusoidal embedding (reference test_lcm.py:46-90)."""
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion.stable_diffusion_xl.lcm import (
        ConditionScaleBlock as RefConditionScaleBlock,
        SDXLLcmAdapter as RefLcmAdapter,
    )

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import SDXLLcmAdapter
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.lcm import ConditionScaleBlock

    ref, ours = sdxl_pair
    # everything that mutates the module-scoped fixture happens INSIDE the
    # try so a mid-setup failure can't leak adapters/CFG-flags into the next
    # test sharing the fixture
    ref_adapter = our_adapter = None
    try:
        ref.classifier_free_guidance = False
        ours.classifier_free_guidance = False
        ref_adapter = RefLcmAdapter(ref.unet, condition_scale=8.0).inject()
        our_adapter = SDXLLcmAdapter(ours.unet, condition_scale=8.0).inject()
        # the ConditionScaleBlock's bias-free Linear is fresh random state —
        # sync it (torch Linear weight is (out, in); ours is (in, out))
        ref_linear = ref.unet.ensure_find(RefConditionScaleBlock).ensure_find(rfl.Linear)
        our_linear = ours.unet.ensure_find(ConditionScaleBlock).ensure_find(fl.Linear)
        our_linear.weight = jnp.asarray(ref_linear.weight.detach().numpy().T)

        rs = np.random.RandomState(31)
        noise = rs.randn(1, 4, _LATENT, _LATENT).astype(np.float32)
        emb = rs.randn(1, 77, 2048).astype(np.float32)
        pooled = rs.randn(1, 1280).astype(np.float32)
        image_our, image_ref = _run_traj(ref, ours, noise, emb, pooled, scale=1.0)
        ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    finally:
        if ref_adapter is not None:
            ref_adapter.eject()
        if our_adapter is not None:
            our_adapter.eject()
        ref.classifier_free_guidance = True
        ours.classifier_free_guidance = True


def test_lcm_lora_4_step_pipeline_with_guidance(sdxl_pair) -> None:
    """LCM-LoRA attached via add_lcm_lora's filtered projection pass, run
    WITH guidance at scale 1.2 (reference test_lcm.py:93-141). Synthetic
    kohya-format proj_in/proj_out LoRA shared bit-for-bit between sides."""
    from refiners.foundationals.latent_diffusion.lora import SDLoraManager as RefManager
    from refiners.foundationals.latent_diffusion.stable_diffusion_xl.lcm_lora import add_lcm_lora as ref_add_lcm_lora

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.foundationals.latent_diffusion import SDLoraManager
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import add_lcm_lora
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLCrossAttention

    ref, ours = sdxl_pair
    ref_manager = RefManager(ref)
    our_manager = SDLoraManager(ours)

    # kohya names for every proj_in/proj_out Linear, in walk order (the same
    # construction as tests/foundationals/test_lcm_lora.py, validated against
    # add_lcm_lora's block-prefix validity map)
    containers = list(ours.unet.layers(SDXLCrossAttention))
    assert len(containers) == 11
    block_names = (
        ["down_blocks_1"] * 2 + ["down_blocks_2"] * 2 + ["mid_block"] + ["up_blocks_0"] * 3 + ["up_blocks_1"] * 3
    )
    counters: dict[str, int] = {}
    rank = 4
    rs = np.random.RandomState(32)
    arrays: dict[str, np.ndarray] = {}
    for name, container in zip(block_names, containers):
        idx = counters.get(name, 0)
        counters[name] = idx + 1
        for chain_name, sfx in [("Chain_1", "proj_in"), ("Chain_3", "proj_out")]:
            linear = container.layer(chain_name, fl.Chain).ensure_find(fl.Linear)
            d_in, d_out = linear.weight.shape[0], linear.weight.shape[1]
            stem = f"lora_unet_{name}_attentions_{idx}_{sfx}"
            arrays[f"{stem}.lora_down.weight"] = rs.randn(rank, d_in).astype(np.float32) * 0.1
            arrays[f"{stem}.lora_up.weight"] = rs.randn(d_out, rank).astype(np.float32) * 0.1

    ref_add_lcm_lora(ref_manager, {k: torch.from_numpy(v.copy()) for k, v in arrays.items()})
    add_lcm_lora(our_manager, {k: jnp.asarray(v) for k, v in arrays.items()})

    rs = np.random.RandomState(33)
    noise = rs.randn(1, 4, _LATENT, _LATENT).astype(np.float32)
    emb = rs.randn(2, 77, 2048).astype(np.float32)
    pooled = rs.randn(2, 1280).astype(np.float32)
    try:
        image_our, image_ref = _run_traj(ref, ours, noise, emb, pooled, scale=1.2)
        ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    finally:
        ref_manager.remove_loras("lcm")
        our_manager.remove_loras("lcm")
