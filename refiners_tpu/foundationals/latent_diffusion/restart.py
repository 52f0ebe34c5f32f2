"""Restart sampling (arXiv:2306.14878): re-noise + repeat the DDIM tail.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/restart.py:30.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Any, Generic, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

from refiners_tpu.fluxion import rng
from refiners_tpu.foundationals.latent_diffusion.model import LatentDiffusionModel
from refiners_tpu.foundationals.latent_diffusion.solvers import DDIM, Solver

T = TypeVar("T", bound=LatentDiffusionModel)


def add_noise_interval(
    solver: Solver,
    /,
    x: jax.Array,
    noise: jax.Array,
    initial_timestep: jax.Array,
    target_timestep: jax.Array,
) -> jax.Array:
    initial = solver.cumulative_scale_factors[initial_timestep]
    target = solver.cumulative_scale_factors[target_timestep]
    factor = target / initial
    return factor * x + jnp.sqrt(1 - factor**2) * noise


@dataclass
class Restart(Generic[T]):
    """Restart sampling strategy; DDIM only (restart.py:30)."""

    ldm: T
    num_steps: int = 10
    num_iterations: int = 2
    start_time: float = 0.1
    end_time: float = 2

    def __post_init__(self) -> None:
        assert isinstance(self.ldm.solver, DDIM), "Restart sampling only works with DDIM solver"

    def __call__(
        self,
        x: jax.Array,
        /,
        clip_text_embedding: jax.Array,
        condition_scale: float = 7.5,
        key: jax.Array | None = None,
        **kwargs: Any,
    ) -> jax.Array:
        original_solver = self.ldm.solver
        new_solver = DDIM(self.ldm.solver.num_inference_steps)
        new_solver.timesteps = self.timesteps
        self.ldm.solver = new_solver

        key = key if key is not None else rng.next_key()
        for i in range(self.num_iterations):
            noise = jax.random.normal(jax.random.fold_in(key, i), x.shape, dtype=jnp.float32).astype(x.dtype)
            x = add_noise_interval(
                new_solver,
                x=x,
                noise=noise,
                initial_timestep=self.timesteps[-1],
                target_timestep=self.timesteps[0],
            )
            for step in range(len(self.timesteps) - 1):
                x = self.ldm(
                    x, step=step, clip_text_embedding=clip_text_embedding, condition_scale=condition_scale, **kwargs
                )

        self.ldm.solver = original_solver
        return x

    @cached_property
    def start_step(self) -> int:
        sigmas = self.ldm.solver.noise_std / self.ldm.solver.cumulative_scale_factors
        ts = self.ldm.solver.timesteps.astype(jnp.int32)
        return int(jnp.argmin(jnp.abs(sigmas[ts] - self.start_time)))

    @cached_property
    def end_timestep(self) -> int:
        sigmas = self.ldm.solver.noise_std / self.ldm.solver.cumulative_scale_factors
        return int(jnp.argmin(jnp.abs(sigmas - self.end_time)))

    @cached_property
    def timesteps(self) -> jax.Array:
        start = int(self.ldm.solver.timesteps[self.start_step])
        ts = np.round(np.linspace(start, self.end_timestep, self.num_steps))[::-1].astype(np.int64)
        return jnp.asarray(ts.copy())
