"""Training configuration (pydantic models parsed from TOML).

Reference: /root/reference/src/refiners/training_utils/config.py (:30-185).
Optimizers map to optax (AdamW8bit/Lion8bit map to their full-precision optax
equivalents — TPU HBM makes 8-bit optimizer states a non-goal; Prodigy uses
optax.contrib). LR schedules are multiplier functions replicating torch
scheduler semantics, applied per optimizer step.
"""

from __future__ import annotations

import math
from enum import Enum
from pathlib import Path
from typing import Annotated, Any, Callable, Iterable, Literal, Type, TypeVar

import optax
from pydantic import BaseModel, BeforeValidator, ConfigDict

from refiners_tpu.training_utils.clock import ClockConfig
from refiners_tpu.training_utils.common import Epoch, Iteration, Step, TimeValue, parse_number_unit_field

TimeValueField = Annotated[TimeValue, BeforeValidator(parse_number_unit_field)]
IterationOrEpochField = Annotated[Iteration | Epoch, BeforeValidator(parse_number_unit_field)]
StepField = Annotated[Step, BeforeValidator(parse_number_unit_field)]


class MeshConfig(BaseModel):
    """Device-mesh parallelism for training (TPU-native extension; the
    reference is single-device). DP shards the batch over the "data" axis;
    `tensor > 1` additionally TP-shards attention/FF weights via
    `parallel.ATTENTION_TP_RULES` (megatron split, GSPMD collectives)."""

    data: int | None = None  # None → all remaining devices on the data axis
    tensor: int = 1
    tensor_parallel_rules: bool = True

    model_config = ConfigDict(extra="forbid")


class TrainingConfig(BaseModel):
    device: str = "tpu"
    dtype: str = "float32"
    duration: TimeValueField = Iteration(1)
    seed: int = 0
    gradient_accumulation: StepField = Step(1)
    gradient_clipping_max_norm: float | None = None
    jit_step: bool = False  # jit-compile loss+grad when compute_loss is traceable
    mesh: MeshConfig | None = None  # [training.mesh] TOML section enables DP/TP

    model_config = ConfigDict(extra="forbid", arbitrary_types_allowed=True)


class Optimizers(str, Enum):
    SGD = "SGD"
    Adam = "Adam"
    AdamW = "AdamW"
    AdamW8bit = "AdamW8bit"
    Lion8bit = "Lion8bit"
    Prodigy = "Prodigy"


class LRSchedulerType(str, Enum):
    STEP_LR = "StepLR"
    EXPONENTIAL_LR = "ExponentialLR"
    REDUCE_LR_ON_PLATEAU = "ReduceLROnPlateau"
    COSINE_ANNEALING_LR = "CosineAnnealingLR"
    CONSTANT_LR = "ConstantLR"
    LAMBDA_LR = "LambdaLR"
    ONE_CYCLE_LR = "OneCycleLR"
    MULTIPLICATIVE_LR = "MultiplicativeLR"
    COSINE_ANNEALING_WARM_RESTARTS = "CosineAnnealingWarmRestarts"
    CYCLIC_LR = "CyclicLR"
    MULTI_STEP_LR = "MultiStepLR"
    DEFAULT = "ConstantLR"


class LRSchedulerConfig(BaseModel):
    type: LRSchedulerType = LRSchedulerType.DEFAULT
    update_interval: IterationOrEpochField = Iteration(1)
    warmup: TimeValueField = Iteration(0)
    gamma: float = 0.1
    lr_lambda: Callable[[int], float] | None = None
    mode: Literal["min", "max"] = "min"
    factor: float = 0.1
    patience: int = 10
    threshold: float = 1e-4
    cooldown: int = 0
    milestones: list[int] = []
    base_lr: float = 1e-7
    min_lr: float | list[float] = 0
    max_lr: float | list[float] = 0
    eta_min: float = 0

    model_config = ConfigDict(extra="forbid", arbitrary_types_allowed=True)

    def multiplier(self, t: int, base_lr: float) -> float:
        """LR multiplier after `t` scheduler steps (torch-scheduler semantics)."""
        n = self.update_interval.number
        match self.type:
            case LRSchedulerType.CONSTANT_LR | LRSchedulerType.DEFAULT:
                return 1.0
            case LRSchedulerType.STEP_LR:
                return self.gamma ** (t // n)
            case LRSchedulerType.EXPONENTIAL_LR:
                return self.gamma**t
            case LRSchedulerType.COSINE_ANNEALING_LR:
                eta_min = float(self.eta_min)
                return (eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * t / n)) / 2) / base_lr
            case LRSchedulerType.COSINE_ANNEALING_WARM_RESTARTS:
                t_cur = t % n
                return (1 + math.cos(math.pi * t_cur / n)) / 2
            case LRSchedulerType.LAMBDA_LR:
                assert self.lr_lambda is not None, "lr_lambda must be specified to use LambdaLR"
                return self.lr_lambda(t)
            case LRSchedulerType.MULTIPLICATIVE_LR:
                assert self.lr_lambda is not None, "lr_lambda must be specified to use MultiplicativeLR"
                m = 1.0
                for i in range(1, t + 1):
                    m *= self.lr_lambda(i)
                return m
            case LRSchedulerType.MULTI_STEP_LR:
                return self.gamma ** sum(1 for m in self.milestones if t >= m)
            case LRSchedulerType.ONE_CYCLE_LR:
                max_lr = self.max_lr if isinstance(self.max_lr, float) else self.max_lr[0]
                pct = min(t / max(n, 1), 1.0)
                if pct < 0.3:
                    lr = base_lr + (max_lr - base_lr) * pct / 0.3
                else:
                    lr = max_lr * (1 + math.cos(math.pi * (pct - 0.3) / 0.7)) / 2
                return lr / base_lr
            case LRSchedulerType.CYCLIC_LR:
                max_lr = self.max_lr if isinstance(self.max_lr, float) else self.max_lr[0]
                cycle_pos = (t % (2 * n)) / n if n else 0.0
                frac = cycle_pos if cycle_pos <= 1 else 2 - cycle_pos
                return (self.base_lr + (max_lr - self.base_lr) * frac) / base_lr
            case LRSchedulerType.REDUCE_LR_ON_PLATEAU:
                return 1.0  # handled statefully by the trainer
            case _:
                raise ValueError(f"Unknown scheduler type: {self.type}")


class OptimizerConfig(BaseModel):
    optimizer: Optimizers
    learning_rate: float = 1e-4
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 1e-2

    model_config = ConfigDict(extra="forbid")

    def get(
        self,
        learning_rate: float | None = None,
        betas: tuple[float, float] | None = None,
        eps: float | None = None,
        weight_decay: float | None = None,
    ) -> optax.GradientTransformation:
        lr = learning_rate if learning_rate is not None else self.learning_rate
        b1, b2 = betas if betas is not None else self.betas
        e = eps if eps is not None else self.eps
        wd = weight_decay if weight_decay is not None else self.weight_decay
        match self.optimizer:
            case Optimizers.SGD:
                return optax.chain(
                    optax.add_decayed_weights(wd) if wd else optax.identity(), optax.sgd(lr)
                )
            case Optimizers.Adam:
                return optax.chain(
                    optax.add_decayed_weights(wd) if wd else optax.identity(),
                    optax.adam(lr, b1=b1, b2=b2, eps=e),
                )
            case Optimizers.AdamW | Optimizers.AdamW8bit:
                return optax.adamw(lr, b1=b1, b2=b2, eps=e, weight_decay=wd)
            case Optimizers.Lion8bit:
                return optax.lion(lr, b1=b1, b2=b2, weight_decay=wd)
            case Optimizers.Prodigy:
                return optax.contrib.prodigy(lr, betas=(b1, b2), weight_decay=wd, safeguard_warmup=True)


class ModelConfig(BaseModel):
    requires_grad: bool | None = None
    learning_rate: float | None = None
    betas: tuple[float, float] | None = None
    eps: float | None = None
    weight_decay: float | None = None

    model_config = ConfigDict(extra="forbid")


T = TypeVar("T", bound="BaseConfig")


class BaseConfig(BaseModel):
    training: TrainingConfig
    optimizer: OptimizerConfig
    lr_scheduler: LRSchedulerConfig
    clock: ClockConfig = ClockConfig()

    model_config = ConfigDict(extra="forbid")

    @classmethod
    def load_from_toml(cls: Type[T], toml_path: Path | str) -> T:
        import tomllib

        with open(toml_path, "rb") as f:
            config_dict = tomllib.load(f)
        return cls(**config_dict)
