"""Solver-tail trajectory e2e vs the reference (VERDICT r4 item 4).

Executes the solver paths the table tests miss: Euler over a full 30-step
denoise (scale_model_input interacting with every step, incl. the SDXL
euler-deterministic case) and the DPM++ 2M SDE branch (plain and Karras) with
the reference's exact noise sequence injected. Reference e2e:
/root/reference/tests/e2e/test_diffusion.py:835 (sde), :862 (sde karras),
:949 (euler), :2249 (sdxl euler deterministic).
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


def _sd15_pair(ref_solver, our_solver):
    """Full-width SD1.5 pair (stub CLIP) with shared random weights."""
    torch.manual_seed(60)
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion import StableDiffusion_1 as RefSD

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import StableDiffusion_1

    ref = RefSD(solver=ref_solver, clip_text_encoder=rfl.Chain(rfl.Identity()))  # type: ignore[arg-type]
    ref.unet.eval()
    ref.lda.eval()
    ours = StableDiffusion_1(solver=our_solver, clip_text_encoder=fl.Chain(fl.Identity()))  # type: ignore[arg-type]
    load_reference_state_dict(ours.unet, {k: v.detach().numpy() for k, v in ref.unet.state_dict().items()})
    load_reference_state_dict(ours.lda, {k: v.detach().numpy() for k, v in ref.lda.state_dict().items()})
    return ref, ours


def _run_and_compare(ref, ours, x_ref, x_our, emb, *, scale=7.5, atol=5e-3, solver_keys=None):
    with torch.no_grad():
        for step in ref.steps:
            x_ref = ref(x_ref, step=step, clip_text_embedding=torch.from_numpy(emb.copy()), condition_scale=scale)
        image_ref = ref.lda.decode(x_ref).numpy()
    for step in ours.steps:
        x_our = ours(
            x_our,
            step,
            clip_text_embedding=jnp.asarray(emb),
            condition_scale=scale,
            **({"solver_key": solver_keys} if solver_keys is not None else {}),
        )
    image_our = np.asarray(ours.lda.decode(x_our)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=atol)
    ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)


def test_euler_30_step_trajectory() -> None:
    """Euler NOISE-prediction over 30 steps: init ·init_noise_sigma, per-step
    /√(σ²+1) scaling, full-pipeline drift (reference e2e :949)."""
    from refiners.foundationals.latent_diffusion.solvers import Euler as RefEuler

    from refiners_tpu.foundationals.latent_diffusion.solvers import Euler

    ref, ours = _sd15_pair(RefEuler(num_inference_steps=30), Euler(num_inference_steps=30))
    rs = np.random.RandomState(61)
    noise = rs.randn(1, 4, 32, 32).astype(np.float32)
    emb = rs.randn(2, 77, 768).astype(np.float32)

    x_ref = ref.solver.scale_model_input(torch.from_numpy(noise.copy()), step=-1)
    x_our = ours.solver.scale_model_input(jnp.asarray(noise.transpose(0, 2, 3, 1)), step=-1)
    np.testing.assert_allclose(
        np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=1e-4
    )  # init_noise_sigma scaling agrees
    _run_and_compare(ref, ours, x_ref, x_our, emb)
    del ref, ours
    gc.collect()


def test_sdxl_euler_30_step_trajectory() -> None:
    """The SDXL euler-deterministic case (reference e2e :2249)."""
    torch.manual_seed(62)
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion import StableDiffusion_XL as RefSDXL
    from refiners.foundationals.latent_diffusion.solvers import Euler as RefEuler

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import StableDiffusion_XL
    from refiners_tpu.foundationals.latent_diffusion.solvers import Euler

    ref = RefSDXL(solver=RefEuler(num_inference_steps=30), clip_text_encoder=rfl.Chain(rfl.Identity()))  # type: ignore[arg-type]
    ref.unet.eval()
    ref.lda.eval()
    ours = StableDiffusion_XL(solver=Euler(num_inference_steps=30), clip_text_encoder=fl.Chain(fl.Identity()))  # type: ignore[arg-type]
    load_reference_state_dict(ours.unet, {k: v.detach().numpy() for k, v in ref.unet.state_dict().items()})
    load_reference_state_dict(ours.lda, {k: v.detach().numpy() for k, v in ref.lda.state_dict().items()})

    rs = np.random.RandomState(63)
    noise = rs.randn(1, 4, 24, 24).astype(np.float32)
    emb = rs.randn(2, 77, 2048).astype(np.float32)
    pooled = rs.randn(2, 1280).astype(np.float32)

    x_ref = ref.solver.scale_model_input(torch.from_numpy(noise.copy()), step=-1)
    x_our = ours.solver.scale_model_input(jnp.asarray(noise.transpose(0, 2, 3, 1)), step=-1)

    with torch.no_grad():
        for step in ref.steps:
            x_ref = ref(
                x_ref,
                step=step,
                clip_text_embedding=torch.from_numpy(emb.copy()),
                pooled_text_embedding=torch.from_numpy(pooled.copy()),
                time_ids=ref.default_time_ids,
                condition_scale=5.0,
            )
        image_ref = ref.lda.decode(x_ref).numpy()
    del ref
    gc.collect()

    for step in ours.steps:
        x_our = ours(
            x_our,
            step,
            clip_text_embedding=jnp.asarray(emb),
            pooled_text_embedding=jnp.asarray(pooled),
            time_ids=ours.default_time_ids,
            condition_scale=5.0,
        )
    image_our = np.asarray(ours.lda.decode(x_our)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=5e-3)
    ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    del ours
    gc.collect()


def _fixed_noise_dpm(dpm_cls, noises, **kwargs):
    """DPMSolver whose SDE noise is the provided per-step sequence — the same
    draws the torch reference makes from its seeded global RNG."""

    class FixedNoiseDPM(dpm_cls):
        def _sde_noise(self, key, shape):
            noise = noises.pop(0)
            assert noise.shape == shape, f"{noise.shape} != {shape}"
            return jnp.asarray(noise)

    return FixedNoiseDPM(**kwargs)


@pytest.mark.parametrize("schedule", ["plain", "karras"])
def test_dpm_sde_trajectory(schedule: str) -> None:
    """DPM++ 2M SDE full trajectory (reference e2e :835 plain 50-step → 20
    steps here for CPU feasibility; :862 karras 18-step + last_step_first_order
    exactly). The reference draws torch.randn from the global RNG inside each
    solver step (dpm.py:317-322); we replay the identical sequence and inject
    it through the `_sde_noise` seam, so the trajectories must agree tightly."""
    from refiners.foundationals.latent_diffusion.solvers import (
        DPMSolver as RefDPM,
        NoiseSchedule as RefNoiseSchedule,
        SolverParams as RefSolverParams,
    )

    from refiners_tpu.foundationals.latent_diffusion.solvers import DPMSolver
    from refiners_tpu.foundationals.latent_diffusion.solvers.solver import NoiseSchedule, SolverParams

    if schedule == "plain":
        steps, lsfo = 20, False
        ref_params = RefSolverParams(sde_variance=1.0)
        our_params = SolverParams(sde_variance=1.0)
    else:
        steps, lsfo = 18, True
        ref_params = RefSolverParams(sde_variance=1.0, sigma_schedule=RefNoiseSchedule.KARRAS)
        our_params = SolverParams(sde_variance=1.0, sigma_schedule=NoiseSchedule.KARRAS)

    rs = np.random.RandomState(64)
    noise = rs.randn(1, 4, 32, 32).astype(np.float32)
    emb = rs.randn(2, 77, 768).astype(np.float32)

    # replay the reference's global-RNG draw sequence: one randn per step
    torch.manual_seed(65)
    sde_noises = [torch.randn(1, 4, 32, 32).numpy() for _ in range(steps)]
    # NHWC for our solver (latents are channels-last)
    our_noises = [n.transpose(0, 2, 3, 1) for n in sde_noises]

    ref, ours = _sd15_pair(
        RefDPM(num_inference_steps=steps, params=ref_params, last_step_first_order=lsfo),
        _fixed_noise_dpm(
            DPMSolver,
            our_noises,
            num_inference_steps=steps,
            params=our_params,
            last_step_first_order=lsfo,
        ),
    )

    x_ref = torch.from_numpy(noise.copy())
    torch.manual_seed(65)  # the solver consumes the global RNG in step order
    with torch.no_grad():
        for step in ref.steps:
            x_ref = ref(x_ref, step=step, clip_text_embedding=torch.from_numpy(emb.copy()), condition_scale=7.5)
        image_ref = ref.lda.decode(x_ref).numpy()
    del ref
    gc.collect()

    x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))
    for step in ours.steps:
        x_our = ours(x_our, step, clip_text_embedding=jnp.asarray(emb), condition_scale=7.5)
    image_our = np.asarray(ours.lda.decode(x_our)).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=5e-3)
    ensure_similar_images(image_our, image_ref, min_psnr=35, min_ssim=0.98)
    del ours
    gc.collect()
