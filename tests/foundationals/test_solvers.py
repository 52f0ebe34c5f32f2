"""Solver numeric parity vs the reference implementation (torch CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


def _trajectory_ours(solver, x0: np.ndarray, noise_fn=None) -> np.ndarray:
    x = jnp.asarray(x0)
    for step in solver.inference_steps:
        # fake "predicted noise": deterministic function of x and step
        pn = jnp.asarray(_fake_noise(np.asarray(x), step))
        x = solver(x, pn, step)
    return np.asarray(x)


def _trajectory_ref(solver, x0: np.ndarray) -> np.ndarray:
    x = torch.from_numpy(x0.copy())
    for step in solver.inference_steps:
        pn = torch.from_numpy(_fake_noise(x.numpy(), step))
        x = solver(x, pn, step)
    return x.numpy()


def _fake_noise(x: np.ndarray, step: int) -> np.ndarray:
    rng = np.random.RandomState(step)
    return (0.1 * np.tanh(x) + rng.randn(*x.shape).astype(np.float32) * 0.01).astype(np.float32)


@pytest.mark.parametrize("first_step", [0, 7])
def test_ddim_matches_reference(first_step: int) -> None:
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

    from refiners_tpu.foundationals.latent_diffusion.solvers import DDIM

    ref = RefDDIM(num_inference_steps=30, first_inference_step=first_step)
    ours = DDIM(num_inference_steps=30, first_inference_step=first_step)
    np.testing.assert_allclose(np.asarray(ours.timesteps), ref.timesteps.numpy(), atol=0)

    x0 = np.random.RandomState(0).randn(1, 4, 4, 4).astype(np.float32)
    np.testing.assert_allclose(_trajectory_ours(ours, x0), _trajectory_ref(ref, x0), atol=1e-4)


def test_euler_matches_reference() -> None:
    from refiners.foundationals.latent_diffusion.solvers import Euler as RefEuler

    from refiners_tpu.foundationals.latent_diffusion.solvers import Euler

    ref = RefEuler(num_inference_steps=30)
    ours = Euler(num_inference_steps=30)
    np.testing.assert_allclose(np.asarray(ours.sigmas), ref.sigmas.numpy(), atol=1e-5)

    x0 = np.random.RandomState(1).randn(1, 4, 4, 4).astype(np.float32)
    # scale_model_input parity (incl. step=-1)
    np.testing.assert_allclose(
        np.asarray(ours.scale_model_input(jnp.asarray(x0), -1)),
        ref.scale_model_input(torch.from_numpy(x0.copy()), -1).numpy(),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours.scale_model_input(jnp.asarray(x0), 3)),
        ref.scale_model_input(torch.from_numpy(x0.copy()), 3).numpy(),
        rtol=1e-5,
    )
    np.testing.assert_allclose(_trajectory_ours(ours, x0), _trajectory_ref(ref, x0), atol=1e-4)


@pytest.mark.parametrize("last_step_first_order", [False, True])
def test_dpm_matches_reference(last_step_first_order: bool) -> None:
    from refiners.foundationals.latent_diffusion.solvers import DPMSolver as RefDPM

    from refiners_tpu.foundationals.latent_diffusion.solvers import DPMSolver

    ref = RefDPM(num_inference_steps=30, last_step_first_order=last_step_first_order)
    ours = DPMSolver(num_inference_steps=30, last_step_first_order=last_step_first_order)
    np.testing.assert_allclose(np.asarray(ours.timesteps), ref.timesteps.numpy(), atol=0)
    # torch.linspace f32 differs from numpy by ulps; amplified ~3e-6 rel by the cumprod
    np.testing.assert_allclose(np.asarray(ours.sigmas), ref.sigmas.numpy(), rtol=1e-5)

    x0 = np.random.RandomState(2).randn(1, 4, 4, 4).astype(np.float32)
    np.testing.assert_allclose(_trajectory_ours(ours, x0), _trajectory_ref(ref, x0), atol=1e-4)


def test_dpm_karras_sigmas_match_reference() -> None:
    from refiners.foundationals.latent_diffusion.solvers import DPMSolver as RefDPM
    from refiners.foundationals.latent_diffusion.solvers import SolverParams as RefParams
    from refiners.foundationals.latent_diffusion.solvers.solver import NoiseSchedule as RefNS

    from refiners_tpu.foundationals.latent_diffusion.solvers import DPMSolver, NoiseSchedule, SolverParams

    ref = RefDPM(num_inference_steps=20, params=RefParams(sigma_schedule=RefNS.KARRAS))
    ours = DPMSolver(num_inference_steps=20, params=SolverParams(sigma_schedule=NoiseSchedule.KARRAS))
    np.testing.assert_allclose(np.asarray(ours.sigmas), ref.sigmas.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.timesteps), ref.timesteps.numpy(), atol=0)


def test_dpm_scan_matches_stateful() -> None:
    """The functional scan path must equal the stateful eager path."""
    from refiners_tpu.foundationals.latent_diffusion.solvers import DPMSolver

    ours = DPMSolver(num_inference_steps=10)
    x0 = jnp.asarray(np.random.RandomState(3).randn(1, 4, 4, 4).astype(np.float32))

    # eager, stateful
    x = x0
    for step in ours.inference_steps:
        x = ours(x, 0.1 * jnp.tanh(x), step)
    eager = np.asarray(x)

    # scan, functional
    solver2 = DPMSolver(num_inference_steps=10)

    def body(carry, step):
        x, state = carry
        out, state = solver2.step(x, 0.1 * jnp.tanh(x), step, state)
        return (out, state), None

    state0 = jnp.broadcast_to(solver2.init_state(), x0.shape)
    (scanned, _), _ = jax.lax.scan(body, (x0, state0), jnp.arange(10))
    np.testing.assert_allclose(np.asarray(scanned), eager, atol=1e-5)


def test_lcm_timesteps_match_reference() -> None:
    from refiners.foundationals.latent_diffusion.solvers import LCMSolver as RefLCM

    from refiners_tpu.foundationals.latent_diffusion.solvers import LCMSolver

    ref = RefLCM(num_inference_steps=4)
    ours = LCMSolver(num_inference_steps=4)
    np.testing.assert_allclose(np.asarray(ours.timesteps), ref.timesteps.numpy(), atol=0)
    assert ours.timestep_indices == ref.timestep_indices


def test_add_remove_noise_match_reference() -> None:
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

    from refiners_tpu.foundationals.latent_diffusion.solvers import DDIM

    ref = RefDDIM(num_inference_steps=30)
    ours = DDIM(num_inference_steps=30)
    x = np.random.RandomState(4).randn(1, 8, 8, 4).astype(np.float32)
    n = np.random.RandomState(5).randn(1, 8, 8, 4).astype(np.float32)
    for step in [0, 10, 29]:
        np.testing.assert_allclose(
            np.asarray(ours.add_noise(jnp.asarray(x), jnp.asarray(n), step)),
            ref.add_noise(torch.from_numpy(x.copy()), torch.from_numpy(n.copy()), step).numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ours.remove_noise(jnp.asarray(x), jnp.asarray(n), step)),
            ref.remove_noise(torch.from_numpy(x.copy()), torch.from_numpy(n.copy()), step).numpy(),
            atol=1e-4,
        )
