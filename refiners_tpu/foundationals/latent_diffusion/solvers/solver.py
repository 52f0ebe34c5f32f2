"""Diffusion solver base.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/solvers/solver.py
(Solver :113, enums :15-:50, SolverParams :62-110).

TPU-native design: all schedules are precomputed on host in float64 numpy
(matching the reference's numpy quirks, SURVEY hard part (d)) and stored as
float32 device tables. `__call__(x, noise, step)` works with a *traced* step
index — every branch on `step` is expressed with `jnp.where` over gathered
table entries — so the full denoising loop runs as one `jax.lax.scan` inside
a single compiled program. Stateful multistep solvers (DPM) additionally
expose a functional `step(x, noise, step, state)` API for scan carries.
"""

from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod
from enum import Enum
from typing import Any, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

from refiners_tpu.fluxion import layers as fl

T = TypeVar("T", bound="Solver")


class NoiseSchedule(str, Enum):
    """Noise schedule kinds (solver.py:15)."""

    UNIFORM = "uniform"
    QUADRATIC = "quadratic"  # "Stable Diffusion" schedule, arXiv:2305.08891 table 1
    KARRAS = "karras"  # arXiv:2206.00364 eq. 5


class TimestepSpacing(str, Enum):
    """Timestep spacing kinds, arXiv:2305.08891 table 2 (solver.py:29)."""

    LINSPACE = "linspace"
    LINSPACE_ROUNDED = "linspace_rounded"
    LEADING = "leading"
    TRAILING = "trailing"
    CUSTOM = "custom"


class ModelPredictionType(str, Enum):
    """What the diffusion model predicts (solver.py:50)."""

    NOISE = "noise"
    SAMPLE = "sample"


@dataclasses.dataclass(kw_only=True, frozen=True)
class BaseSolverParams:
    num_train_timesteps: int | None
    timesteps_spacing: TimestepSpacing | None
    timesteps_offset: int | None
    initial_diffusion_rate: float | None
    final_diffusion_rate: float | None
    noise_schedule: NoiseSchedule | None
    sigma_schedule: NoiseSchedule | None
    model_prediction_type: ModelPredictionType | None
    sde_variance: float


@dataclasses.dataclass(kw_only=True, frozen=True)
class SolverParams(BaseSolverParams):
    """User-facing partial parameters (solver.py:77)."""

    num_train_timesteps: int | None = None
    timesteps_spacing: TimestepSpacing | None = None
    timesteps_offset: int | None = None
    initial_diffusion_rate: float | None = None
    final_diffusion_rate: float | None = None
    noise_schedule: NoiseSchedule | None = None
    sigma_schedule: NoiseSchedule | None = None
    model_prediction_type: ModelPredictionType | None = None
    sde_variance: float = 0.0


@dataclasses.dataclass(kw_only=True, frozen=True)
class ResolvedSolverParams(BaseSolverParams):
    num_train_timesteps: int
    timesteps_spacing: TimestepSpacing
    timesteps_offset: int
    initial_diffusion_rate: float
    final_diffusion_rate: float
    noise_schedule: NoiseSchedule
    sigma_schedule: NoiseSchedule | None
    model_prediction_type: ModelPredictionType
    sde_variance: float


def _is_static_int(step: Any) -> bool:
    return isinstance(step, int) or (isinstance(step, np.integer))


class Solver(fl.Module, ABC):
    """Base diffusion solver; precomputes schedule tables (solver.py:113)."""

    timesteps: jax.Array
    params: ResolvedSolverParams

    default_params = ResolvedSolverParams(
        num_train_timesteps=1000,
        timesteps_spacing=TimestepSpacing.LINSPACE,
        timesteps_offset=0,
        initial_diffusion_rate=8.5e-4,
        final_diffusion_rate=1.2e-2,
        noise_schedule=NoiseSchedule.QUADRATIC,
        sigma_schedule=None,
        model_prediction_type=ModelPredictionType.NOISE,
        sde_variance=0.0,
    )

    def __init__(
        self,
        num_inference_steps: int,
        first_inference_step: int = 0,
        params: BaseSolverParams | None = None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__()
        self.num_inference_steps = num_inference_steps
        self.first_inference_step = first_inference_step
        self.params = self.resolve_params(params)

        # host-side float64 schedule math, stored float32 (solver.py:174-178)
        scale_factors = self._np_noise_schedule()
        cumulative = np.sqrt(np.cumprod(scale_factors))
        noise_std = np.sqrt(1.0 - np.cumprod(scale_factors))
        self.scale_factors = jnp.asarray(scale_factors, dtype=jnp.float32)
        self.cumulative_scale_factors = jnp.asarray(cumulative, dtype=jnp.float32)
        self.noise_std = jnp.asarray(noise_std, dtype=jnp.float32)
        self.signal_to_noise_ratios = jnp.asarray(np.log(cumulative) - np.log(noise_std), dtype=jnp.float32)
        self.timesteps = jnp.asarray(self._generate_timesteps())

    # -- schedule construction (host, numpy) --------------------------------

    def resolve_params(self, params: BaseSolverParams | None) -> ResolvedSolverParams:
        if params is None:
            return dataclasses.replace(self.default_params)
        return dataclasses.replace(
            self.default_params,
            **{k: v for k, v in dataclasses.asdict(params).items() if v is not None},
        )

    def _np_power_distribution(self, power: float) -> np.ndarray:
        """linspace between diffusion rates in power-space (solver.py:385).

        float32 on purpose: the reference builds these tables with default
        torch float32, and downstream float64 math (DPM) starts from the
        float32-rounded values — matching keeps solvers bit-comparable.
        """
        return (
            np.linspace(
                np.float32(self.params.initial_diffusion_rate) ** np.float32(1 / power),
                np.float32(self.params.final_diffusion_rate) ** np.float32(1 / power),
                self.params.num_train_timesteps,
                dtype=np.float32,
            )
            ** np.float32(power)
        )

    def _np_noise_schedule(self) -> np.ndarray:
        """1 - beta_t table (solver.py:sample_noise_schedule)."""
        match self.params.noise_schedule:
            case NoiseSchedule.UNIFORM:
                return 1.0 - self._np_power_distribution(1)
            case NoiseSchedule.QUADRATIC:
                return 1.0 - self._np_power_distribution(2)
            case NoiseSchedule.KARRAS:
                return 1.0 - self._np_power_distribution(7)

    @staticmethod
    def generate_timesteps(
        spacing: TimestepSpacing,
        num_inference_steps: int,
        num_train_timesteps: int = 1000,
        offset: int = 0,
    ) -> np.ndarray:
        """Timesteps (descending) for a given spacing (solver.py:205)."""
        max_timestep = num_train_timesteps - 1 + offset
        match spacing:
            case TimestepSpacing.LINSPACE:
                return np.linspace(offset, max_timestep, num_inference_steps, dtype=np.float64)[::-1].astype(
                    np.float32
                )
            case TimestepSpacing.LINSPACE_ROUNDED:
                return np.linspace(offset, max_timestep, num_inference_steps).round().astype(np.int32)[::-1]
            case TimestepSpacing.LEADING:
                step_ratio = num_train_timesteps // num_inference_steps
                return (np.arange(0, num_inference_steps, 1) * step_ratio + offset).astype(np.int32)[::-1]
            case TimestepSpacing.TRAILING:
                step_ratio = num_train_timesteps // num_inference_steps
                return np.arange(max_timestep, offset, -step_ratio).astype(np.int32)
            case TimestepSpacing.CUSTOM:
                raise RuntimeError("generate_timesteps called with custom spacing")

    def _generate_timesteps(self) -> np.ndarray:
        return self.generate_timesteps(
            spacing=self.params.timesteps_spacing,
            num_inference_steps=self.num_inference_steps,
            num_train_timesteps=self.params.num_train_timesteps,
            offset=self.params.timesteps_offset,
        )

    # -- runtime API ---------------------------------------------------------

    @abstractmethod
    def __call__(
        self, x: jax.Array, predicted_noise: jax.Array, step: int | jax.Array, key: jax.Array | None = None
    ) -> jax.Array:
        """Apply one denoising step; `step` may be a traced index."""
        ...

    def init_state(self) -> Any:
        """Scan-carry state for multistep solvers; () when stateless."""
        return ()

    def step(
        self,
        x: jax.Array,
        predicted_noise: jax.Array,
        step: int | jax.Array,
        state: Any,
        key: jax.Array | None = None,
    ) -> tuple[jax.Array, Any]:
        """Functional step for `lax.scan`; default = stateless __call__."""
        return self(x, predicted_noise, step, key=key), state

    def _check_step(self, step: int | jax.Array) -> None:
        if _is_static_int(step):
            assert self.first_inference_step <= step < self.num_inference_steps, f"invalid step {step}"

    def _add_noise(self, x: jax.Array, noise: jax.Array, step: int | jax.Array) -> jax.Array:
        timestep = self.timesteps[step].astype(jnp.int32)
        csf = self.cumulative_scale_factors[timestep]
        std = self.noise_std[timestep]
        # arXiv:2006.11239 Eq. 4
        return (csf * x.astype(jnp.float32) + std * noise.astype(jnp.float32)).astype(x.dtype)

    def add_noise(self, x: jax.Array, noise: jax.Array, step: int | jax.Array | list[int]) -> jax.Array:
        if isinstance(step, list):
            assert len(x) == len(noise) == len(step)
            return jnp.stack([self._add_noise(x[i], noise[i], step[i]) for i in range(x.shape[0])], axis=0)
        return self._add_noise(x, noise, step)

    def remove_noise(self, x: jax.Array, noise: jax.Array, step: int | jax.Array) -> jax.Array:
        """arXiv:2006.11239 Eq. 15 (solver.py:300)."""
        timestep = self.timesteps[step].astype(jnp.int32)
        csf = self.cumulative_scale_factors[timestep]
        std = self.noise_std[timestep]
        return ((x.astype(jnp.float32) - std * noise.astype(jnp.float32)) / csf).astype(x.dtype)

    @property
    def all_steps(self) -> list[int]:
        return list(range(self.num_inference_steps))

    @property
    def inference_steps(self) -> list[int]:
        return self.all_steps[self.first_inference_step :]

    def rebuild(self: T, num_inference_steps: int | None, first_inference_step: int | None = None) -> T:
        """New instance with updated step configuration (solver.py:349)."""
        return self.__class__(
            num_inference_steps=(
                self.num_inference_steps if num_inference_steps is None else num_inference_steps
            ),
            first_inference_step=(
                self.first_inference_step if first_inference_step is None else first_inference_step
            ),
            params=dataclasses.replace(self.params),
        )

    def scale_model_input(self, x: jax.Array, step: int | jax.Array) -> jax.Array:
        """Identity by default (solver.py:367)."""
        return x
