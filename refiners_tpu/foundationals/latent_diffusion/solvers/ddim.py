"""DDIM solver (arXiv:2010.02502).

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/solvers/ddim.py:14.
Branch-free in `step` so the denoise loop scans.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from refiners_tpu.foundationals.latent_diffusion.solvers.solver import (
    BaseSolverParams,
    ModelPredictionType,
    Solver,
    TimestepSpacing,
)


class DDIM(Solver):
    default_params = dataclasses.replace(
        Solver.default_params,
        timesteps_spacing=TimestepSpacing.LEADING,
        timesteps_offset=1,
    )

    def __init__(
        self,
        num_inference_steps: int,
        first_inference_step: int = 0,
        params: BaseSolverParams | None = None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        if params and params.model_prediction_type not in (ModelPredictionType.NOISE, None):
            raise NotImplementedError
        if params and params.sde_variance != 0.0:
            raise NotImplementedError("DDIM does not support sde_variance != 0.0 yet")
        super().__init__(
            num_inference_steps=num_inference_steps,
            first_inference_step=first_inference_step,
            params=params,
            device=device,
            dtype=dtype,
        )

    def __call__(
        self, x: jax.Array, predicted_noise: jax.Array, step: int | jax.Array, key: jax.Array | None = None
    ) -> jax.Array:
        """Deterministic DDIM update (ddim.py:86-93); no noise on last step."""
        self._check_step(step)
        step = jnp.asarray(step, dtype=jnp.int32)
        n = self.num_inference_steps

        timestep = self.timesteps[step].astype(jnp.int32)
        is_last = step == n - 1
        prev_timestep = jnp.where(is_last, 0, self.timesteps[jnp.minimum(step + 1, n - 1)].astype(jnp.int32))

        current_scale = self.cumulative_scale_factors[timestep]
        previous_scale = self.cumulative_scale_factors[prev_timestep]

        xf = x.astype(jnp.float32)
        nf = predicted_noise.astype(jnp.float32)
        predicted_x = (xf - jnp.sqrt(1 - current_scale**2) * nf) / current_scale
        noise_factor = jnp.where(is_last, 0.0, jnp.sqrt(1 - previous_scale**2))
        return (previous_scale * predicted_x + noise_factor * nf).astype(x.dtype)
