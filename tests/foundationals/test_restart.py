"""Restart sampling strategy parity vs the reference (stubbed denoiser)."""

import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


class _RefLdm:
    def __init__(self, solver) -> None:
        self.solver = solver
        self.device = torch.device("cpu")
        self.dtype = torch.float32

    def __call__(self, x, *, step, clip_text_embedding, condition_scale, **kwargs):
        return 0.9 * x + 0.01 * clip_text_embedding.mean()


class _OurLdm:
    def __init__(self, solver) -> None:
        self.solver = solver

    def __call__(self, x, step, *, clip_text_embedding, condition_scale, **kwargs):
        return 0.9 * x + 0.01 * clip_text_embedding.mean()


def test_restart_schedule_and_loop_match_reference(monkeypatch) -> None:
    import jax.numpy as jnp
    from refiners.foundationals.latent_diffusion.restart import Restart as RefRestart
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM

    import refiners_tpu.foundationals.latent_diffusion.restart as restart_mod
    from refiners_tpu.foundationals.latent_diffusion.restart import Restart, add_noise_interval
    from refiners_tpu.foundationals.latent_diffusion.solvers import DDIM

    ref = RefRestart(ldm=_RefLdm(RefDDIM(num_inference_steps=30)), num_steps=6, num_iterations=2)
    ours = Restart(ldm=_OurLdm(DDIM(num_inference_steps=30)), num_steps=6, num_iterations=2)

    # schedule parity
    assert ours.start_step == ref.start_step
    assert ours.end_timestep == ref.end_timestep
    np.testing.assert_array_equal(np.asarray(ours.timesteps), ref.timesteps.numpy())

    # add_noise_interval parity
    rs = np.random.RandomState(0)
    x = rs.randn(1, 4, 8, 8).astype(np.float32)
    noise = rs.randn(1, 4, 8, 8).astype(np.float32)
    got = add_noise_interval(
        ours.ldm.solver, x=jnp.asarray(x), noise=jnp.asarray(noise),
        initial_timestep=ours.timesteps[-1], target_timestep=ours.timesteps[0],
    )
    from refiners.foundationals.latent_diffusion.restart import add_noise_interval as ref_interval

    expected = ref_interval(
        ref.ldm.solver if hasattr(ref.ldm, "solver") else None,
        x=torch.from_numpy(x.copy()), noise=torch.from_numpy(noise.copy()),
        initial_timestep=ref.timesteps[-1], target_timestep=ref.timesteps[0],
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-5)

    # full restart loop with identical injected noise on both sides
    fixed_noise = [rs.randn(1, 4, 8, 8).astype(np.float32) for _ in range(2)]
    it_ref = iter(fixed_noise)
    monkeypatch.setattr(torch, "randn_like", lambda input, **kw: torch.from_numpy(next(it_ref).copy()))
    it_our = iter(fixed_noise)

    class _FakeRandom:
        @staticmethod
        def normal(key, shape, dtype=None):
            return jnp.asarray(next(it_our))

        @staticmethod
        def fold_in(key, i):
            return key

    monkeypatch.setattr(restart_mod.jax, "random", _FakeRandom)

    emb = rs.randn(2, 77, 8).astype(np.float32)
    out_ref = ref(torch.from_numpy(x.copy()), clip_text_embedding=torch.from_numpy(emb.copy()))
    out_our = ours(jnp.asarray(x), clip_text_embedding=jnp.asarray(emb), key=jnp.zeros((), jnp.uint32))
    np.testing.assert_allclose(np.asarray(out_our), out_ref.numpy(), atol=1e-5)
