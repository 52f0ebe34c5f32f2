"""DPM-Solver++ (2M) (arXiv:2211.01095), deterministic and SDE variants.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/solvers/dpm.py:33.
Constants are computed in float64 numpy on host to match the original DPM
codebase's linspace semantics (dpm.py:118-124), then stored as float32 tables
indexed by *inference step*. The multistep state (previous x0 estimate) is a
scan carry in the functional `step` API; the stateful `__call__` keeps the
reference's deque behavior for step-by-step use.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from refiners_tpu.fluxion import layers as fl
from refiners_tpu.foundationals.latent_diffusion.solvers.solver import (
    BaseSolverParams,
    ModelPredictionType,
    NoiseSchedule,
    Solver,
    TimestepSpacing,
    _is_static_int,
)


def _np_safe_log(x: np.ndarray, lower_bound: float = 1e-6) -> np.ndarray:
    return np.log(np.maximum(x, lower_bound))


def _safe_sqrt(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.maximum(x, 0))


class DPMSolver(Solver):
    default_params = dataclasses.replace(Solver.default_params, timesteps_spacing=TimestepSpacing.CUSTOM)

    # mutable trace-time deque: not a pytree member
    _pytree_ignore = fl.Module._pytree_ignore | {"estimated_data"}

    def __init__(
        self,
        num_inference_steps: int,
        first_inference_step: int = 0,
        params: BaseSolverParams | None = None,
        last_step_first_order: bool = False,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        if params and params.model_prediction_type not in (ModelPredictionType.NOISE, None):
            raise NotImplementedError
        if params and params.sde_variance not in (0.0, 1.0):
            raise NotImplementedError("DPMSolver only supports sde_variance=0.0 or 1.0")
        super().__init__(
            num_inference_steps=num_inference_steps,
            first_inference_step=first_inference_step,
            params=params,
            device=device,
            dtype=dtype,
        )
        self.estimated_data = deque([jnp.zeros(())] * 2, maxlen=2)
        self.last_step_first_order = last_step_first_order

        # float64 host math from float32-rounded base tables (dpm.py:80-92:
        # the reference computes its base tables in f32 and upcasts to f64
        # before the sigma math)
        scale_factors = self._np_noise_schedule()
        cumprod32 = np.cumprod(scale_factors, dtype=np.float32)
        cumulative = np.sqrt(cumprod32, dtype=np.float32).astype(np.float64)
        noise_std = np.sqrt(1.0 - cumprod32, dtype=np.float32).astype(np.float64)
        sigmas = noise_std / cumulative
        np_timesteps = np.asarray(self.timesteps, dtype=np.float64)
        rescaled = self._np_rescale_sigmas(sigmas, self.params.sigma_schedule, np_timesteps)
        sigma_min = sigmas[0:1]  # diffusers' final_sigmas_type="sigma_min"
        full_sigmas = np.concatenate([rescaled, sigma_min])

        self.sigmas = jnp.asarray(full_sigmas, dtype=jnp.float32)
        cum = 1.0 / np.sqrt(full_sigmas**2 + 1.0)
        std = full_sigmas * cum
        self.cumulative_scale_factors = jnp.asarray(cum, dtype=jnp.float32)
        self.noise_std = jnp.asarray(std, dtype=jnp.float32)
        self.signal_to_noise_ratios = jnp.asarray(
            _np_safe_log(cum) - _np_safe_log(std), dtype=jnp.float32
        )
        self.timesteps = jnp.asarray(self._np_timesteps_from_sigmas(sigmas, full_sigmas), dtype=jnp.int32)

    def rebuild(
        self, num_inference_steps: int | None, first_inference_step: int | None = None
    ) -> "DPMSolver":
        r = super().rebuild(num_inference_steps, first_inference_step)
        r.last_step_first_order = self.last_step_first_order
        return r

    def _generate_timesteps(self) -> np.ndarray:
        if self.params.timesteps_spacing != TimestepSpacing.CUSTOM:
            return super()._generate_timesteps()
        # numpy linspace semantics matter: np.linspace(0,999,31)[15] is
        # 499.49999999999994 — matching the original DPM codebase (dpm.py:118)
        offset = self.params.timesteps_offset
        max_timestep = self.params.num_train_timesteps - 1 + offset
        np_space = np.linspace(offset, max_timestep, self.num_inference_steps + 1).round().astype(np.int32)[1:]
        return np_space[::-1].copy()

    def _np_rescale_sigmas(
        self, sigmas: np.ndarray, sigma_schedule: NoiseSchedule | None, timesteps: np.ndarray
    ) -> np.ndarray:
        """Sigma rescale per schedule (Karras ρ=7) (dpm.py:153-175)."""
        match sigma_schedule:
            case NoiseSchedule.UNIFORM:
                rho = 1
            case NoiseSchedule.QUADRATIC:
                rho = 2
            case NoiseSchedule.KARRAS:
                rho = 7
            case None:
                return np.interp(timesteps, np.arange(0, len(sigmas)), sigmas)
        linear = np.linspace(0, 1, self.num_inference_steps)
        first, last = sigmas[0], sigmas[-1]
        rescaled = (first ** (1 / rho) + linear * (last ** (1 / rho) - first ** (1 / rho))) ** rho
        return rescaled[::-1].copy()

    def _np_timesteps_from_sigmas(self, train_sigmas: np.ndarray, step_sigmas: np.ndarray) -> np.ndarray:
        """Map step sigmas back to (interpolated, rounded) train timesteps
        (dpm.py:177-199)."""
        log_train = _np_safe_log(train_sigmas)
        out = []
        for sigma in step_sigmas[:-1]:
            log_sigma = _np_safe_log(np.asarray(sigma))
            dist = log_sigma - log_train[:, None]
            low_idx = int(np.argmax(np.cumsum((dist >= 0), axis=0), axis=0).clip(max=len(train_sigmas) - 2)[0])
            high_idx = low_idx + 1
            low, high = log_train[low_idx], log_train[high_idx]
            w = np.clip((low - log_sigma) / (low - high), 0, 1)
            out.append(((1 - w) * low_idx + w * high_idx).item())
        return np.asarray(out).round().astype(np.int32)

    # step-indexed noise helpers (dpm.py:201-230)
    def _add_noise(self, x: jax.Array, noise: jax.Array, step: int | jax.Array) -> jax.Array:
        csf = self.cumulative_scale_factors[step]
        std = self.noise_std[step]
        return (csf * x.astype(jnp.float32) + std * noise.astype(jnp.float32)).astype(x.dtype)

    def remove_noise(self, x: jax.Array, noise: jax.Array, step: int | jax.Array) -> jax.Array:
        csf = self.cumulative_scale_factors[step]
        std = self.noise_std[step]
        return ((x.astype(jnp.float32) - std * noise.astype(jnp.float32)) / csf).astype(x.dtype)

    # -- updates (dpm.py:215-329) -------------------------------------------

    def _first_order_update(
        self, x: jax.Array, estimate: jax.Array, step: jax.Array, sde_noise: jax.Array | None
    ) -> jax.Array:
        current_ratio = self.signal_to_noise_ratios[step]
        next_ratio = self.signal_to_noise_ratios[step + 1]
        next_scale = self.cumulative_scale_factors[step + 1]
        next_std = self.noise_std[step + 1]
        current_std = self.noise_std[step]
        ratio_delta = current_ratio - next_ratio

        if sde_noise is None:
            return (next_std / current_std) * x + (1.0 - jnp.exp(ratio_delta)) * next_scale * estimate
        factor = 1.0 - jnp.exp(2.0 * ratio_delta)
        return (
            (next_std / current_std) * jnp.exp(ratio_delta) * x
            + next_scale * factor * estimate
            + next_std * _safe_sqrt(factor) * sde_noise
        )

    def _second_order_update(
        self,
        x: jax.Array,
        estimate: jax.Array,
        prev_estimate: jax.Array,
        step: jax.Array,
        sde_noise: jax.Array | None,
    ) -> jax.Array:
        next_ratio = self.signal_to_noise_ratios[step + 1]
        current_ratio = self.signal_to_noise_ratios[step]
        previous_ratio = self.signal_to_noise_ratios[jnp.maximum(step - 1, 0)]
        next_scale = self.cumulative_scale_factors[step + 1]
        next_std = self.noise_std[step + 1]
        current_std = self.noise_std[step]

        estimation_delta = (estimate - prev_estimate) / (
            (current_ratio - previous_ratio) / (next_ratio - current_ratio)
        )
        ratio_delta = current_ratio - next_ratio

        if sde_noise is None:
            factor = 1.0 - jnp.exp(ratio_delta)
            return (
                (next_std / current_std) * x
                + next_scale * factor * estimate
                + 0.5 * next_scale * factor * estimation_delta
            )
        factor = 1.0 - jnp.exp(2.0 * ratio_delta)
        return (
            (next_std / current_std) * jnp.exp(ratio_delta) * x
            + next_scale * factor * estimate
            + 0.5 * next_scale * factor * estimation_delta
            + next_std * _safe_sqrt(factor) * sde_noise
        )

    def _update(
        self,
        x: jax.Array,
        predicted_noise: jax.Array,
        step: int | jax.Array,
        prev_estimate: jax.Array,
        key: jax.Array | None,
    ) -> tuple[jax.Array, jax.Array]:
        static_step = _is_static_int(step)
        step = jnp.asarray(step, dtype=jnp.int32)
        xf = x.astype(jnp.float32)
        nf = predicted_noise.astype(jnp.float32)
        scale = self.cumulative_scale_factors[step]
        std = self.noise_std[step]
        estimate = (xf - std * nf) / scale

        variance = self.params.sde_variance
        sde_noise = None
        if variance > 0.0:
            sde_noise = self._sde_noise(key, x.shape) * variance

        use_first = jnp.logical_or(
            step == self.first_inference_step,
            jnp.logical_and(self.last_step_first_order, step == self.num_inference_steps - 1),
        )
        if static_step:
            if bool(use_first):
                out = self._first_order_update(xf, estimate, step, sde_noise)
            else:
                out = self._second_order_update(xf, estimate, prev_estimate, step, sde_noise)
        else:
            first = self._first_order_update(xf, estimate, step, sde_noise)
            second = self._second_order_update(xf, estimate, prev_estimate, step, sde_noise)
            out = jnp.where(use_first, first, second)
        return out.astype(x.dtype), estimate

    def _sde_noise(self, key: jax.Array | None, shape: tuple[int, ...]) -> jax.Array:
        """SDE noise draw — the reference samples torch.randn(generator)
        (dpm.py:317-322); here a jax PRNG key threaded through the scan. A
        separate method so trajectory tests can inject the reference's exact
        noise sequence."""
        assert key is not None, "SDE variant needs a PRNG key"
        return jax.random.normal(key, shape, dtype=jnp.float32)

    def init_state(self) -> jax.Array:
        return jnp.zeros(())  # broadcastable placeholder previous estimate

    def step(
        self,
        x: jax.Array,
        predicted_noise: jax.Array,
        step: int | jax.Array,
        state: jax.Array,
        key: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        out, estimate = self._update(x, predicted_noise, step, jnp.broadcast_to(state, x.shape).astype(jnp.float32), key)
        return out, estimate

    def __call__(
        self, x: jax.Array, predicted_noise: jax.Array, step: int | jax.Array, key: jax.Array | None = None
    ) -> jax.Array:
        self._check_step(step)
        prev = self.estimated_data[-1]
        prev = jnp.broadcast_to(prev, x.shape).astype(jnp.float32)
        out, estimate = self._update(x, predicted_noise, step, prev, key)
        self.estimated_data.append(estimate)
        return out
