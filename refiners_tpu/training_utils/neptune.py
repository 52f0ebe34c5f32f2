"""Neptune logging callback.

Reference: /root/reference/src/refiners/training_utils/neptune.py (:53-105).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

from pydantic import ConfigDict

from refiners_tpu.training_utils.callback import Callback, CallbackConfig

if TYPE_CHECKING:
    from refiners_tpu.training_utils.trainer import Trainer


class NeptuneConfig(CallbackConfig):
    project: str = "refiners-tpu"
    name: str | None = None
    tags: list[str] = []

    model_config = ConfigDict(extra="allow")


class NeptuneCallback(Callback["Trainer[Any, Any]"]):
    def __init__(self, config: NeptuneConfig) -> None:
        import neptune  # type: ignore

        self.config = config
        self.run = neptune.init_run(project=config.project, name=config.name, tags=config.tags)

    def log(self, key: str, value: Any) -> None:
        self.run[key].append(value)

    def on_compute_loss_end(self, trainer: "Trainer[Any, Any]") -> None:
        self.log("train/step_loss", float(trainer.loss))

    def on_optimizer_step_end(self, trainer: "Trainer[Any, Any]") -> None:
        self.log("train/grad_norm", trainer.grad_norm)
        self.log("train/learning_rate", trainer.current_learning_rate())

    def on_train_end(self, trainer: "Trainer[Any, Any]") -> None:
        self.run.stop()


class NeptuneMixin:
    def neptune_log(self, key: str, value: Any) -> None:
        callback = getattr(self, "callbacks", {}).get("neptune")
        if callback is not None:
            callback.log(key, value)
