"""Euler solver (arXiv:2206.00364).

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/solvers/euler.py:13.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from refiners_tpu.foundationals.latent_diffusion.solvers.solver import (
    BaseSolverParams,
    ModelPredictionType,
    NoiseSchedule,
    Solver,
    _is_static_int,
)


class Euler(Solver):
    def __init__(
        self,
        num_inference_steps: int,
        first_inference_step: int = 0,
        params: BaseSolverParams | None = None,
        device: Any = None,
        dtype: Any = None,
    ):
        if params and params.noise_schedule not in (NoiseSchedule.QUADRATIC, None):
            raise NotImplementedError
        if params and params.sde_variance != 0.0:
            raise NotImplementedError("Euler does not support sde_variance != 0.0 yet")
        super().__init__(
            num_inference_steps=num_inference_steps,
            first_inference_step=first_inference_step,
            params=params,
            device=device,
            dtype=dtype,
        )
        self.sigmas = jnp.asarray(self._generate_sigmas(), dtype=jnp.float32)

    @property
    def init_noise_sigma(self) -> jax.Array:
        return jnp.max(self.sigmas)

    def _generate_sigmas(self) -> np.ndarray:
        """sigma table interpolated at the timesteps (euler.py:56-61)."""
        sigmas = np.asarray(self.noise_std) / np.asarray(self.cumulative_scale_factors)
        sigmas = np.interp(np.asarray(self.timesteps, dtype=np.float64), np.arange(0, len(sigmas)), sigmas)
        return np.concatenate([sigmas, [0.0]])

    def scale_model_input(self, x: jax.Array, step: int | jax.Array) -> jax.Array:
        """·init_noise_sigma at step -1; /√(σ²+1) otherwise (euler.py:63-78)."""
        if _is_static_int(step) and step == -1:
            return x * self.init_noise_sigma.astype(x.dtype)
        sigma = self.sigmas[step]
        return (x.astype(jnp.float32) / jnp.sqrt(sigma**2 + 1)).astype(x.dtype)

    def __call__(
        self, x: jax.Array, predicted_noise: jax.Array, step: int | jax.Array, key: jax.Array | None = None
    ) -> jax.Array:
        self._check_step(step)
        step = jnp.asarray(step, dtype=jnp.int32)
        xf = x.astype(jnp.float32)
        pf = predicted_noise.astype(jnp.float32)

        if self.params.model_prediction_type == ModelPredictionType.SAMPLE:
            x0 = pf  # model predicts x0 directly (euler.py:94-100)
            ratio = self.sigmas[step + 1] / self.sigmas[step]
            return (ratio * xf + (1 - ratio) * x0).astype(x.dtype)

        assert self.params.model_prediction_type == ModelPredictionType.NOISE
        return (xf + pf * (self.sigmas[step + 1] - self.sigmas[step])).astype(x.dtype)
