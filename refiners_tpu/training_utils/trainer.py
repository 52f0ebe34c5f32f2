"""Generic Trainer.

Reference: /root/reference/src/refiners/training_utils/trainer.py:123.
API preserved (registries via decorators, abstract compute_loss /
create_data_iterable, callbacks, clock, gradient accumulation/clipping).

JAX design: models are pytrees, so the backward pass is
`jax.value_and_grad` of `compute_loss` with candidate modules swapped in —
optionally jit-compiled (`training.jit_step`) so forward+backward+loss run as
one XLA program. Optimizers are optax transformations (one per model, with
per-model hyperparameters); gradient accumulation sums gradient pytrees and
applies the update every N steps.
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from functools import cached_property, wraps
from typing import Any, Callable, Generic, Iterable, TypeVar, cast

import jax
import jax.numpy as jnp
import optax

from refiners_tpu.fluxion import layers as fl
from refiners_tpu.training_utils.callback import Callback, CallbackConfig
from refiners_tpu.training_utils.clock import ClockConfig, TrainingClock
from refiners_tpu.training_utils.common import (
    Step,
    count_learnable_parameters,
    human_readable_number,
    scoped_seed,
)
from refiners_tpu.training_utils.config import BaseConfig, LRSchedulerType, ModelConfig

logger = logging.getLogger("refiners_tpu.training")

Batch = TypeVar("Batch")
ConfigType = TypeVar("ConfigType", bound=BaseConfig)


@dataclass
class ModelItem:
    name: str
    config: ModelConfig
    model: fl.Module
    trainable: bool
    opt_state: Any = None
    grad_accum: Any = None


ModelRegistry = dict[str, ModelItem]
ModuleT = TypeVar("ModuleT", bound=fl.Module)
ModelConfigT = TypeVar("ModelConfigT", bound=ModelConfig)
CallbackT = TypeVar("CallbackT", bound=Callback[Any])
CallbackConfigT = TypeVar("CallbackConfigT", bound=CallbackConfig)


def register_model():
    def decorator(func: Callable[[Any, ModelConfigT], ModuleT]) -> ModuleT:
        @wraps(func)
        def wrapper(self: "Trainer[BaseConfig, Any]", config: ModelConfigT) -> fl.Module:
            name = func.__name__
            model = func(self, config)
            dtype = self.dtype
            if dtype is not None:
                model = model.to(dtype=dtype)
            if (mesh := self.mesh) is not None:
                from refiners_tpu.parallel import ATTENTION_TP_RULES, shard_module

                mesh_cfg = self.config.training.mesh
                rules = ATTENTION_TP_RULES if (mesh_cfg and mesh_cfg.tensor_parallel_rules) else []
                shard_module(model, mesh, rules)
            trainable = config.requires_grad if config.requires_grad is not None else True
            numel = model.param_count()
            logger.info(f"Number of parameters in {name}: {human_readable_number(numel)} (trainable={trainable})")
            self.models[name] = ModelItem(name=name, config=config, model=model, trainable=trainable)
            setattr(self, name, model)
            return model

        return wrapper  # type: ignore[return-value]

    return decorator


def register_callback():
    def decorator(func: Callable[[Any, CallbackConfigT], CallbackT]) -> CallbackT:
        @wraps(func)
        def wrapper(self: "Trainer[BaseConfig, Any]", config: CallbackConfigT) -> Callback[Any]:
            name = func.__name__
            callback = func(self, config)
            self.callbacks[name] = callback
            setattr(self, name, callback)
            return callback

        return wrapper  # type: ignore[return-value]

    return decorator


class Trainer(Generic[ConfigType, Batch], ABC):
    def __init__(self, config: ConfigType) -> None:
        self._models: ModelRegistry = {}
        self._callbacks: dict[str, Callback[Any]] = {}
        self.config = config
        self.loss: jax.Array | None = None
        self.grad_norm: float = 0.0
        self._scheduler_steps = 0
        self._plateau: dict[str, Any] = {"best": None, "bad": 0, "cooldown": 0, "factor": 1.0}
        self._grad_fn: Callable[..., Any] | None = None
        self._load_callbacks()
        self._call_callbacks(event_name="on_init_begin")
        self._load_models()
        self._call_callbacks(event_name="on_init_end")

    @register_callback()
    def clock(self, config: ClockConfig) -> TrainingClock:
        return TrainingClock(
            training_duration=self.config.training.duration,
            gradient_accumulation=self.config.training.gradient_accumulation,
            verbose=config.verbose,
        )

    @property
    def models(self) -> ModelRegistry:
        return self._models

    @property
    def callbacks(self) -> dict[str, Callback[Any]]:
        return self._callbacks

    @cached_property
    def dtype(self) -> Any:
        from refiners_tpu.fluxion.utils import str_to_dtype

        return str_to_dtype(self.config.training.dtype)

    @cached_property
    def mesh(self) -> Any:
        """("data", "tensor") device mesh when [training.mesh] is configured
        (TPU-native extension: DP batch sharding + optional megatron TP;
        GSPMD inserts the gradient psums — no hand-written comm)."""
        cfg = self.config.training.mesh
        if cfg is None:
            return None
        from refiners_tpu.parallel import make_mesh

        return make_mesh(data=cfg.data, tensor=cfg.tensor)

    def shard_batch(self, batch: Any) -> Any:
        """DP-shard every array leaf of `batch` whose leading axis divides the
        mesh "data" axis; replicate the rest. No-op without a mesh."""
        mesh = self.mesh
        if mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        from refiners_tpu.parallel import data_sharding

        n_data = mesh.shape["data"]

        def place(leaf: Any) -> Any:
            if isinstance(leaf, jax.Array) and leaf.ndim >= 1 and leaf.shape[0] % n_data == 0:
                return jax.device_put(leaf, data_sharding(mesh, leaf.ndim))
            if isinstance(leaf, jax.Array):
                return jax.device_put(leaf, NamedSharding(mesh, P()))
            return leaf

        return jax.tree.map(place, batch)

    @property
    def trainable_models(self) -> dict[str, fl.Module]:
        return {name: item.model for name, item in self.models.items() if item.trainable}

    @property
    def learnable_parameters(self) -> list[jax.Array]:
        return [a for m in self.trainable_models.values() for _, a in m.arrays()]

    @property
    def learnable_parameter_count(self) -> int:
        return count_learnable_parameters(self.learnable_parameters)

    # -- learning rate -------------------------------------------------------

    def _lr_multiplier(self, model_config: ModelConfig) -> float:
        cfg = self.config.lr_scheduler
        # `is not None`, not truthiness: an explicit per-model lr of 0.0 must
        # freeze the model, not fall back to the global learning rate
        base = (
            model_config.learning_rate
            if model_config.learning_rate is not None
            else self.config.optimizer.learning_rate
        )
        warmup = (
            cfg.warmup.number
            if isinstance(cfg.warmup, Step)
            else cfg.warmup.number * self.clock.gradient_accumulation.number
        )
        t = self._scheduler_steps
        if warmup > 0 and t <= warmup:
            return max(t, 0) / warmup
        mult = cfg.multiplier(t - warmup, base)
        return mult * self._plateau["factor"]

    def current_learning_rate(self, name: str | None = None) -> float:
        item = next(iter(self.models.values())) if name is None else self.models[name]
        base = item.config.learning_rate if item.config.learning_rate is not None else self.config.optimizer.learning_rate
        return base * self._lr_multiplier(item.config)

    def _optimizer_for(self, item: ModelItem) -> optax.GradientTransformation:
        c = item.config
        return self.config.optimizer.get(
            learning_rate=self.current_learning_rate(item.name),
            betas=c.betas,
            eps=c.eps,
            weight_decay=c.weight_decay,
        )

    # -- loss / gradients ----------------------------------------------------

    @abstractmethod
    def compute_loss(self, batch: Batch) -> jax.Array: ...

    @abstractmethod
    def create_data_iterable(self) -> Iterable[Batch]: ...

    @cached_property
    def data_iterable(self) -> Iterable[Batch]:
        return self.create_data_iterable()

    def _bind(self, modules: dict[str, fl.Module]) -> dict[str, fl.Module]:
        old = {}
        for n, m in modules.items():
            old[n] = self.models[n].model
            self.models[n].model = m
            setattr(self, n, m)
        return old

    def _loss_and_grad(self, batch: Batch) -> tuple[jax.Array, dict[str, Any]]:
        trainable = self.trainable_models

        def loss_fn(modules: dict[str, fl.Module], batch: Batch) -> jax.Array:
            old = self._bind(modules)
            try:
                return self.compute_loss(batch)
            finally:
                self._bind(old)

        if self._grad_fn is None:
            fn = jax.value_and_grad(loss_fn)
            if self.config.training.jit_step:
                fn = jax.jit(fn)
            self._grad_fn = fn
        loss, grads = self._grad_fn(trainable, batch)
        return loss, grads

    # -- optimization --------------------------------------------------------

    def backward(self) -> None:
        """Accumulate gradients; apply clipped optimizer update when due
        (trainer.py:292-311)."""
        self._call_callbacks(event_name="on_backward_begin")
        accum = self.config.training.gradient_accumulation.number
        grads = jax.tree.map(lambda g: g / accum, self._last_grads)
        for name, item in self.models.items():
            if not item.trainable:
                continue
            g = grads[name]
            item.grad_accum = g if item.grad_accum is None else jax.tree.map(jnp.add, item.grad_accum, g)
        self._call_callbacks(event_name="on_backward_end")

        if self.clock.is_optimizer_step:
            self._call_callbacks(event_name="on_optimizer_step_begin")
            max_norm = self.config.training.gradient_clipping_max_norm or float("inf")
            all_grads = [item.grad_accum for item in self.models.values() if item.trainable]
            total_norm = float(optax.global_norm(all_grads))
            self.grad_norm = total_norm
            clip_scale = min(1.0, max_norm / (total_norm + 1e-6)) if max_norm != float("inf") else 1.0

            for name, item in self.models.items():
                if not item.trainable:
                    continue
                tx = self._optimizer_for(item)
                g = jax.tree.map(lambda x: x * clip_scale, item.grad_accum)
                if item.opt_state is None:
                    item.opt_state = tx.init(item.model)
                updates, item.opt_state = tx.update(g, item.opt_state, item.model)
                item.model = cast(fl.Module, optax.apply_updates(item.model, updates))
                setattr(self, name, item.model)
                item.grad_accum = None
            self._call_callbacks(event_name="on_optimizer_step_end")

            if self.clock.is_due(self.config.lr_scheduler.update_interval):
                self._call_callbacks(event_name="on_lr_scheduler_step_begin")
                self.lr_scheduler_step()
                self._call_callbacks(event_name="on_lr_scheduler_step_end")

    def lr_scheduler_step(self) -> None:
        self._scheduler_steps += 1
        cfg = self.config.lr_scheduler
        if cfg.type == LRSchedulerType.REDUCE_LR_ON_PLATEAU and self.loss is not None:
            current = float(self.loss)
            p = self._plateau
            better = p["best"] is None or (
                current < p["best"] - cfg.threshold if cfg.mode == "min" else current > p["best"] + cfg.threshold
            )
            if better:
                p["best"], p["bad"] = current, 0
            elif p["cooldown"] > 0:
                p["cooldown"] -= 1
            else:
                p["bad"] += 1
                if p["bad"] > cfg.patience:
                    p["factor"] *= cfg.factor
                    p["bad"], p["cooldown"] = 0, cfg.cooldown

    def step(self, batch: Batch) -> None:
        """Single training step (trainer.py:313)."""
        self._call_callbacks(event_name="on_compute_loss_begin")
        batch = cast(Batch, self.shard_batch(batch))
        loss, grads = self._loss_and_grad(batch)
        self.loss = loss
        self._last_grads = grads
        self._call_callbacks(event_name="on_compute_loss_end")
        self.backward()

    def epoch(self) -> None:
        for batch in self.data_iterable:
            if self.clock.done:
                break
            self._call_callbacks(event_name="on_step_begin")
            self.step(batch=batch)
            self._call_callbacks(event_name="on_step_end")

    @staticmethod
    def get_training_seed(instance: "Trainer[BaseConfig, Any]") -> int:
        return instance.config.training.seed

    @scoped_seed(seed=get_training_seed)
    def train(self) -> None:
        """Main training loop (trainer.py:335)."""
        self._call_callbacks(event_name="on_train_begin")
        assert self.learnable_parameters, "There are no learnable parameters in the models."
        while not self.clock.done:
            self._call_callbacks(event_name="on_epoch_begin")
            self.epoch()
            self._call_callbacks(event_name="on_epoch_end")
        self._call_callbacks(event_name="on_train_end")

    # -- callbacks / loading -------------------------------------------------

    def _run_event(self, callback: Callback[Any], event_name: str) -> None:
        getattr(callback, event_name)(self)

    def _call_callbacks(self, event_name: str) -> None:
        if event_name.endswith("_begin"):
            self._run_event(self.clock, event_name)
        for callback in self.callbacks.values():
            if callback is self.clock:
                continue
            self._run_event(callback, event_name)
        if event_name.endswith("_end"):
            self._run_event(self.clock, event_name)

    def _load_callbacks(self) -> None:
        for name, config in self.config:
            if not isinstance(config, CallbackConfig):
                continue
            try:
                registered_callback = getattr(self, name)
            except AttributeError:
                raise ValueError(
                    f"Callback {name} is in the config but not registered in the Trainer. "
                    "Create a method with the @register_callback decorator."
                )
            assert callable(registered_callback)
            registered_callback(config)

    def _load_models(self) -> None:
        for name, config in self.config:
            if not isinstance(config, ModelConfig):
                continue
            try:
                registered_model = getattr(self, name)
            except AttributeError:
                raise ValueError(
                    f"Model {name} is in the config but not registered in the Trainer. "
                    "Create a method with the @register_model decorator."
                )
            assert callable(registered_model)
            registered_model(config)
