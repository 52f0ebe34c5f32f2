"""Training checkpoint/resume — a genuine extension over the reference.

The reference persists weights only (safetensors) with no training resume
(SURVEY §5). Here the full training state — model arrays, optimizer state,
clock counters, scheduler step — round-trips through orbax, so multi-hour TPU
runs survive preemption.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import TYPE_CHECKING, Any

import jax

from refiners_tpu.training_utils.callback import Callback, CallbackConfig
from refiners_tpu.training_utils.common import TimeValue, parse_number_unit_field

if TYPE_CHECKING:
    from refiners_tpu.training_utils.trainer import Trainer


class CheckpointConfig(CallbackConfig):
    directory: str = "checkpoints"
    interval: str = "1:epoch"
    keep: int = 3


class CheckpointCallback(Callback["Trainer[Any, Any]"]):
    def __init__(self, config: CheckpointConfig) -> None:
        self.config = config
        self.interval: TimeValue = parse_number_unit_field(config.interval)
        self.directory = Path(config.directory)

    def save(self, trainer: "Trainer[Any, Any]", tag: str) -> Path:
        import orbax.checkpoint as ocp

        path = (self.directory / tag).absolute()
        state: dict[str, Any] = {}
        for name, item in trainer.models.items():
            state[f"model_{name}"] = dict(item.model.state_dict())
            if item.opt_state is not None:
                state[f"opt_{name}"] = item.opt_state
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path / "state", state, force=True)
        meta = {
            "step": trainer.clock.step,
            "epoch": trainer.clock.epoch,
            "iteration": trainer.clock.iteration,
            "scheduler_steps": trainer._scheduler_steps,
        }
        (path / "meta.json").write_text(json.dumps(meta))
        self._prune()
        return path

    def restore(self, trainer: "Trainer[Any, Any]", tag: str) -> None:
        import orbax.checkpoint as ocp

        path = (self.directory / tag).absolute()
        with ocp.PyTreeCheckpointer() as ckptr:
            state = ckptr.restore(path / "state")
        for name, item in trainer.models.items():
            item.model.load_state_dict({k: jax.numpy.asarray(v) for k, v in state[f"model_{name}"].items()})
            if f"opt_{name}" in state:
                item.opt_state = state[f"opt_{name}"]
        meta = json.loads((path / "meta.json").read_text())
        trainer.clock.step = meta["step"]
        trainer.clock.epoch = meta["epoch"]
        trainer.clock.iteration = meta["iteration"]
        trainer._scheduler_steps = meta["scheduler_steps"]

    def _prune(self) -> None:
        if not self.directory.exists():
            return
        tags = sorted(self.directory.iterdir(), key=lambda p: p.stat().st_mtime)
        for old in tags[: -self.config.keep]:
            import shutil

            shutil.rmtree(old, ignore_errors=True)

    def on_epoch_end(self, trainer: "Trainer[Any, Any]") -> None:
        if trainer.clock.is_due(self.interval):
            self.save(trainer, f"step_{trainer.clock.step}")
