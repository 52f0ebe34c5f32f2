from refiners_tpu.training_utils.callback import Callback, CallbackConfig
from refiners_tpu.training_utils.checkpointing import CheckpointCallback, CheckpointConfig
from refiners_tpu.training_utils.clock import ClockConfig, TrainingClock
from refiners_tpu.training_utils.common import (
    Epoch,
    Iteration,
    Step,
    TimeUnit,
    TimeValue,
    human_readable_number,
    scoped_seed,
    seed_everything,
)
from refiners_tpu.training_utils.neptune import NeptuneConfig, NeptuneMixin
from refiners_tpu.training_utils.wandb import WandbConfig, WandbMixin
from refiners_tpu.training_utils.config import (
    BaseConfig,
    LRSchedulerConfig,
    LRSchedulerType,
    ModelConfig,
    OptimizerConfig,
    Optimizers,
    TrainingConfig,
)
from refiners_tpu.training_utils.data_loader import DataLoader, DataLoaderConfig, DatasetFromCallable, create_data_loader
from refiners_tpu.training_utils.forcecommit import ForceCommit, ForceCommitConfig
from refiners_tpu.training_utils.trainer import ModelItem, Trainer, register_callback, register_model

__all__ = [
    "Callback",
    "CallbackConfig",
    "CheckpointCallback",
    "CheckpointConfig",
    "ClockConfig",
    "TrainingClock",
    "Epoch",
    "Iteration",
    "Step",
    "TimeUnit",
    "TimeValue",
    "WandbMixin",
    "WandbConfig",
    "NeptuneMixin",
    "NeptuneConfig",
    "human_readable_number",
    "scoped_seed",
    "seed_everything",
    "BaseConfig",
    "LRSchedulerConfig",
    "LRSchedulerType",
    "ModelConfig",
    "OptimizerConfig",
    "Optimizers",
    "TrainingConfig",
    "DataLoader",
    "DataLoaderConfig",
    "DatasetFromCallable",
    "create_data_loader",
    "ForceCommit",
    "ForceCommitConfig",
    "ModelItem",
    "Trainer",
    "register_callback",
    "register_model",
]
