"""DDPM solver — training-only noise schedule provider (arXiv:2006.11239).

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/solvers/ddpm.py:13.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

from refiners_tpu.foundationals.latent_diffusion.solvers.solver import (
    BaseSolverParams,
    ModelPredictionType,
    Solver,
    TimestepSpacing,
)


class DDPM(Solver):
    """Only used for training latent diffusion models; cannot be called."""

    default_params = dataclasses.replace(Solver.default_params, timesteps_spacing=TimestepSpacing.LEADING)

    def __init__(
        self,
        num_inference_steps: int,
        first_inference_step: int = 0,
        params: BaseSolverParams | None = None,
        device: Any = None,
    ) -> None:
        if params and params.model_prediction_type not in (ModelPredictionType.NOISE, None):
            raise NotImplementedError
        super().__init__(
            num_inference_steps=num_inference_steps,
            first_inference_step=first_inference_step,
            params=params,
            device=device,
        )

    def __call__(
        self, x: jax.Array, predicted_noise: jax.Array, step: int | jax.Array, key: jax.Array | None = None
    ) -> jax.Array:
        raise NotImplementedError
