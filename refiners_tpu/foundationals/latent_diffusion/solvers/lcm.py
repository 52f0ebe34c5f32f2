"""Latent Consistency Model solver (arXiv:2310.04378).

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/solvers/lcm.py:15.
Wraps an internal DPM solver ("skipping-steps" distillation) and re-noises
between consistency steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from refiners_tpu.fluxion import layers as fl
from refiners_tpu.foundationals.latent_diffusion.solvers.dpm import DPMSolver
from refiners_tpu.foundationals.latent_diffusion.solvers.solver import (
    BaseSolverParams,
    ModelPredictionType,
    Solver,
    SolverParams,
    TimestepSpacing,
    _is_static_int,
)


class LCMSolver(Solver):
    # spacing applies to the underlying DPM solver
    default_params = dataclasses.replace(Solver.default_params, timesteps_spacing=TimestepSpacing.TRAILING)

    _pytree_ignore = fl.Module._pytree_ignore | {"_dpm"}

    def __init__(
        self,
        num_inference_steps: int,
        first_inference_step: int = 0,
        params: BaseSolverParams | None = None,
        num_orig_steps: int = 50,
        device: Any = None,
        dtype: Any = None,
    ):
        assert (
            num_orig_steps >= num_inference_steps
        ), f"num_orig_steps ({num_orig_steps}) < num_inference_steps ({num_inference_steps})"

        params = self.resolve_params(params)
        if params.model_prediction_type != ModelPredictionType.NOISE:
            raise NotImplementedError
        self.num_orig_steps = num_orig_steps
        self._dpm = [
            DPMSolver(
                num_inference_steps=num_orig_steps,
                params=SolverParams(
                    num_train_timesteps=params.num_train_timesteps,
                    timesteps_spacing=params.timesteps_spacing,
                ),
            )
        ]
        super().__init__(
            num_inference_steps=num_inference_steps,
            first_inference_step=first_inference_step,
            params=params,
            device=device,
            dtype=dtype,
        )
        # device tables for the scan path
        self._next_step_indices = jnp.asarray(
            self.timestep_indices[1:] + [0], dtype=jnp.int32
        )

    @property
    def dpm(self) -> DPMSolver:
        return self._dpm[0]

    def rebuild(self, num_inference_steps: int | None, first_inference_step: int | None = None) -> "LCMSolver":
        return self.__class__(
            num_inference_steps=self.num_inference_steps if num_inference_steps is None else num_inference_steps,
            first_inference_step=(
                self.first_inference_step if first_inference_step is None else first_inference_step
            ),
            params=dataclasses.replace(self.params),
            num_orig_steps=self.num_orig_steps,
        )

    def _generate_timesteps(self) -> np.ndarray:
        # Skipping-steps subsampling of the DPM trajectory (lcm.py:80-98)
        indices = np.floor(
            np.linspace(0, self.dpm.num_inference_steps, self.num_inference_steps + 1)[:-1]
        ).astype(int)
        self.timestep_indices: list[int] = indices.tolist()
        return np.asarray(self.dpm.timesteps)[indices]

    def __call__(
        self, x: jax.Array, predicted_noise: jax.Array, step: int | jax.Array, key: jax.Array | None = None
    ) -> jax.Array:
        """Consistency update with c_skip/c_out (σ=0.5, t×10), then re-noise
        between steps via dpm.add_noise (lcm.py:130-153)."""
        static_step = _is_static_int(step)
        step = jnp.asarray(step, dtype=jnp.int32)
        xf = x.astype(jnp.float32)
        nf = predicted_noise.astype(jnp.float32)

        current_timestep = self.timesteps[step]
        scale = self.cumulative_scale_factors[current_timestep]
        std = self.noise_std[current_timestep]
        estimate = (xf - std * nf) / scale

        # "Parameterization for Consistency Models" — see reference notes
        sigma = 0.5
        t = current_timestep.astype(jnp.float32) * 10
        c_skip = sigma**2 / (t**2 + sigma**2)
        c_out = t / jnp.sqrt(sigma**2 + t**2)
        denoised = c_skip * xf + c_out * estimate

        is_last = step == self.num_inference_steps - 1
        if static_step and bool(is_last):
            return denoised.astype(x.dtype)

        assert key is not None, "LCMSolver needs a PRNG key for re-noising"
        noise = jax.random.normal(key, x.shape, dtype=jnp.float32)
        next_step = self._next_step_indices[step]
        renoised = self.dpm.add_noise(denoised, noise, next_step)
        if static_step:
            return renoised.astype(x.dtype)
        return jnp.where(is_last, denoised, renoised).astype(x.dtype)
