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


class _TorchEulerSchedulerShim:
    """Diffusers-like scheduler API over the reference's torch Euler solver —
    a genuinely external (torch-side) scheduler for FrankenSolver, standing in
    for diffusers' EulerDiscreteScheduler (not installed in this image; the
    reference's own test wraps that: /root/reference/tests/foundationals/
    latent_diffusion/test_solvers.py:147-180)."""

    def __init__(self) -> None:
        self.inner = None

    def set_timesteps(self, num_inference_steps: int) -> None:
        from refiners.foundationals.latent_diffusion.solvers import Euler as RefEuler

        self.inner = RefEuler(num_inference_steps=num_inference_steps)

    @property
    def timesteps(self):
        return self.inner.timesteps

    @property
    def init_noise_sigma(self):
        return self.inner.sigmas.max()

    def _step_index(self, timestep) -> int:
        matches = (self.inner.timesteps == timestep).nonzero()
        return int(matches[0].item())

    def scale_model_input(self, sample, timestep):
        return self.inner.scale_model_input(sample, step=self._step_index(timestep))

    def step(self, model_output, timestep, sample):
        import types

        prev = self.inner(sample, predicted_noise=model_output, step=self._step_index(timestep))
        return types.SimpleNamespace(prev_sample=prev)


def test_franken_solver_wraps_external_scheduler() -> None:
    """FrankenSolver over an external torch scheduler reproduces the wrapped
    scheduler step-for-step AND matches our native Euler trajectory
    (reference test: test_solvers.py:147-180)."""
    from refiners_tpu.foundationals.latent_diffusion.solvers import Euler
    from refiners_tpu.foundationals.latent_diffusion.solvers.franken import FrankenSolver

    direct = _TorchEulerSchedulerShim()
    direct.set_timesteps(30)
    solver = FrankenSolver(_TorchEulerSchedulerShim, num_inference_steps=30)
    ours_euler = Euler(num_inference_steps=30)

    np.testing.assert_array_equal(np.asarray(solver.timesteps), direct.timesteps.numpy())

    # init_noise_sigma via scale_model_input(step=-1)
    got_sigma = np.asarray(solver.scale_model_input(jnp.ones(()), step=-1))
    np.testing.assert_allclose(got_sigma, float(direct.init_noise_sigma), rtol=1e-6)

    rs = np.random.RandomState(7)
    sample = rs.randn(1, 4, 8, 8).astype(np.float32)
    predicted_noise = rs.randn(1, 4, 8, 8).astype(np.float32)

    for step, timestep in enumerate(direct.timesteps):
        # per-step scale_model_input parity
        ref_scaled = direct.scale_model_input(torch.from_numpy(sample.copy()), timestep).numpy()
        got_scaled = np.asarray(solver.scale_model_input(jnp.asarray(sample), step=step))
        np.testing.assert_allclose(got_scaled, ref_scaled, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ours_euler.scale_model_input(jnp.asarray(sample), step=step)), ref_scaled, atol=1e-5
        )

        ref_out = direct.step(torch.from_numpy(predicted_noise.copy()), timestep, torch.from_numpy(sample.copy()))
        got = np.asarray(solver(jnp.asarray(sample), jnp.asarray(predicted_noise), step=step))
        np.testing.assert_allclose(got, ref_out.prev_sample.numpy(), atol=1e-6, err_msg=f"step {step}")
        np.testing.assert_allclose(
            np.asarray(ours_euler(jnp.asarray(sample), jnp.asarray(predicted_noise), step=step)),
            ref_out.prev_sample.numpy(),
            atol=1e-5,
        )


def test_franken_solver_rebuild() -> None:
    """rebuild() re-instantiates the wrapped scheduler at the new step count
    (used by MultiUpscaler's strength→first_step rebuilds)."""
    from refiners_tpu.foundationals.latent_diffusion.solvers.franken import FrankenSolver

    solver = FrankenSolver(_TorchEulerSchedulerShim, num_inference_steps=30)
    rebuilt = solver.rebuild(num_inference_steps=10)
    assert rebuilt.num_inference_steps == 10
    assert len(np.asarray(rebuilt.timesteps)) == 10
    direct = _TorchEulerSchedulerShim()
    direct.set_timesteps(10)
    np.testing.assert_array_equal(np.asarray(rebuilt.timesteps), direct.timesteps.numpy())
