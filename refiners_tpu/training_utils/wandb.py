"""Weights & Biases logging callback.

Reference: /root/reference/src/refiners/training_utils/wandb.py (:92-138).
Lazy-imports `wandb`; a missing install degrades to a clear error at init.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from pydantic import ConfigDict

from refiners_tpu.training_utils.callback import Callback, CallbackConfig

if TYPE_CHECKING:
    from refiners_tpu.training_utils.trainer import Trainer


class WandbConfig(CallbackConfig):
    mode: str = "online"
    project: str = "refiners-tpu"
    entity: str | None = None
    name: str | None = None
    tags: list[str] = []
    group: str | None = None
    notes: str | None = None

    model_config = ConfigDict(extra="allow")


class WandbCallback(Callback["Trainer[Any, Any]"]):
    def __init__(self, config: WandbConfig) -> None:
        import wandb  # type: ignore

        self.config = config
        self.run = wandb.init(
            mode=config.mode,
            project=config.project,
            entity=config.entity,
            name=config.name,
            tags=config.tags,
            group=config.group,
            notes=config.notes,
        )
        self.epoch_losses: list[float] = []
        self.iteration_losses: list[float] = []

    def log(self, data: dict[str, Any], step: int) -> None:
        self.run.log(data, step=step)

    def on_compute_loss_end(self, trainer: "Trainer[Any, Any]") -> None:
        loss = float(trainer.loss)
        self.epoch_losses.append(loss)
        self.iteration_losses.append(loss)
        self.log({"step_loss": loss}, step=trainer.clock.step)

    def on_optimizer_step_end(self, trainer: "Trainer[Any, Any]") -> None:
        avg = sum(self.iteration_losses) / max(len(self.iteration_losses), 1)
        self.log(
            {
                "average_iteration_loss": avg,
                "grad_norm": trainer.grad_norm,
                "learning_rate": trainer.current_learning_rate(),
            },
            step=trainer.clock.step,
        )
        self.iteration_losses = []

    def on_epoch_end(self, trainer: "Trainer[Any, Any]") -> None:
        avg = sum(self.epoch_losses) / max(len(self.epoch_losses), 1)
        self.log({"average_epoch_loss": avg, "epoch": trainer.clock.epoch}, step=trainer.clock.step)
        self.epoch_losses = []

    def on_train_end(self, trainer: "Trainer[Any, Any]") -> None:
        self.run.finish()


class WandbMixin:
    """Trainer mixin exposing `wandb_log` (reference wandb.py:124)."""

    def wandb_log(self, data: dict[str, Any]) -> None:
        callback = getattr(self, "callbacks", {}).get("wandb")
        if callback is not None:
            callback.log(data, step=self.clock.step)  # type: ignore[attr-defined]
