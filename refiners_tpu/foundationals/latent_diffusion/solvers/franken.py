"""FrankenSolver: adapt external (diffusers-like) schedulers to the Solver API.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/solvers/franken.py:42.
The wrapped scheduler is host-side Python; steps run eagerly (no scan) — this
is a compatibility shim, not a TPU-hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from refiners_tpu.fluxion import layers as fl
from refiners_tpu.foundationals.latent_diffusion.solvers.solver import Solver, TimestepSpacing


class SchedulerOutputLike(Protocol):
    @property
    def prev_sample(self) -> Any: ...


class SchedulerLike(Protocol):
    timesteps: Any

    @property
    def init_noise_sigma(self) -> Any: ...

    def set_timesteps(self, num_inference_steps: int, *args: Any, **kwargs: Any) -> None: ...

    def scale_model_input(self, sample: Any, timestep: Any) -> Any: ...

    def step(self, model_output: Any, timestep: Any, sample: Any, *args: Any, **kwargs: Any) -> Any: ...


def _to_torch(x: jax.Array) -> Any:
    import torch

    return torch.from_numpy(np.asarray(jnp.asarray(x, dtype=jnp.float32)))


class FrankenSolver(Solver):
    default_params = dataclasses.replace(Solver.default_params, timesteps_spacing=TimestepSpacing.CUSTOM)

    _pytree_ignore = fl.Module._pytree_ignore | {"get_diffusers_scheduler", "diffusers_scheduler"}

    def __init__(
        self,
        get_diffusers_scheduler: Callable[[], SchedulerLike],
        num_inference_steps: int,
        first_inference_step: int = 0,
        device: Any = None,
        dtype: Any = None,
        **kwargs: Any,
    ) -> None:
        self.get_diffusers_scheduler = get_diffusers_scheduler
        self.diffusers_scheduler = get_diffusers_scheduler()
        self.diffusers_scheduler.set_timesteps(num_inference_steps)
        super().__init__(
            num_inference_steps=num_inference_steps,
            first_inference_step=first_inference_step,
        )

    def _generate_timesteps(self) -> np.ndarray:
        return np.asarray(self.diffusers_scheduler.timesteps)

    def rebuild(self, num_inference_steps: int | None, first_inference_step: int | None = None) -> "FrankenSolver":
        return self.__class__(
            get_diffusers_scheduler=self.get_diffusers_scheduler,
            num_inference_steps=self.num_inference_steps if num_inference_steps is None else num_inference_steps,
            first_inference_step=(
                self.first_inference_step if first_inference_step is None else first_inference_step
            ),
        )

    def scale_model_input(self, x: jax.Array, step: int) -> jax.Array:
        if step == -1:
            return x * float(self.diffusers_scheduler.init_noise_sigma)
        t = _to_torch(self.timesteps[step])
        return jnp.asarray(np.asarray(self.diffusers_scheduler.scale_model_input(_to_torch(x), t))).astype(x.dtype)

    def __call__(
        self, x: jax.Array, predicted_noise: jax.Array, step: int, key: jax.Array | None = None
    ) -> jax.Array:
        t = _to_torch(self.timesteps[step])
        r = self.diffusers_scheduler.step(_to_torch(predicted_noise), t, _to_torch(x))
        assert not isinstance(r, tuple), "scheduler returned a tuple"
        return jnp.asarray(np.asarray(r.prev_sample)).astype(x.dtype)
