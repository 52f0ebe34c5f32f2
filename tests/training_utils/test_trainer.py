"""Trainer harness tests, mirroring /root/reference/tests/training_utils/test_trainer.py."""

from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.training_utils import (
    BaseConfig,
    Epoch,
    Iteration,
    ModelConfig,
    Step,
    TimeValue,
    Trainer,
    register_model,
)
from refiners_tpu.training_utils.common import parse_number_unit_field


@dataclass
class MockBatch:
    inputs: jax.Array
    targets: jax.Array


class MockModelConfig(ModelConfig):
    pass


class MockConfig(BaseConfig):
    mock_model: MockModelConfig
    mock_model_frozen: MockModelConfig


class MockModel(fl.Chain):
    def __init__(self) -> None:
        super().__init__(fl.Linear(10, 10), fl.Linear(10, 10), fl.Linear(10, 10))


class MockTrainer(Trainer[MockConfig, MockBatch]):
    step_counter: int = 0

    @register_model()
    def mock_model(self, config: MockModelConfig) -> MockModel:
        return MockModel()

    @register_model()
    def mock_model_frozen(self, config: MockModelConfig) -> MockModel:
        return MockModel()

    def create_data_iterable(self):
        rs = np.random.RandomState(0)
        return [
            MockBatch(
                inputs=jnp.asarray(rs.randn(4, 10).astype(np.float32)),
                targets=jnp.asarray(rs.randn(4, 10).astype(np.float32)),
            )
            for _ in range(8)
        ]

    def compute_loss(self, batch: MockBatch) -> jax.Array:
        self.step_counter += 1
        outputs = self.mock_model(batch.inputs)
        return jnp.mean((outputs - batch.targets) ** 2)


@pytest.fixture
def mock_config() -> MockConfig:
    return MockConfig.load_from_toml(Path(__file__).parent / "mock_config.toml")


@pytest.fixture
def mock_trainer(mock_config: MockConfig) -> MockTrainer:
    return MockTrainer(config=mock_config)


def test_time_value_parsing() -> None:
    assert parse_number_unit_field("10:step") == Step(10)
    assert parse_number_unit_field("20:epoch") == Epoch(20)
    assert parse_number_unit_field("30:iteration") == Iteration(30)
    assert parse_number_unit_field(50) == Step(50)
    with pytest.raises(ValueError):
        parse_number_unit_field("10:wrong")


def test_trainer_registries(mock_trainer: MockTrainer) -> None:
    assert set(mock_trainer.models.keys()) == {"mock_model", "mock_model_frozen"}
    assert "clock" in mock_trainer.callbacks
    assert isinstance(mock_trainer.mock_model, MockModel)
    # only the non-frozen model contributes learnable parameters
    assert mock_trainer.learnable_parameter_count == 3 * (10 * 10 + 10)


def test_clock_arithmetic(mock_trainer: MockTrainer) -> None:
    clock = mock_trainer.clock
    assert clock.gradient_accumulation == Step(4)
    assert clock.done is False
    clock.epoch = 100
    assert clock.done is True
    clock.epoch = 0
    assert clock.is_due(Epoch(2)) is True
    clock.epoch = 3
    assert clock.is_due(Epoch(2)) is False


def test_training_runs_and_updates_weights(mock_config: MockConfig) -> None:
    mock_config.training.duration = Epoch(2)
    mock_trainer = MockTrainer(config=mock_config)
    before = np.asarray(mock_trainer.mock_model[0].weight).copy()
    frozen_before = np.asarray(mock_trainer.mock_model_frozen[0].weight).copy()
    mock_trainer.train()
    after = np.asarray(mock_trainer.mock_model[0].weight)
    frozen_after = np.asarray(mock_trainer.mock_model_frozen[0].weight)
    assert not np.allclose(before, after)
    assert np.array_equal(frozen_before, frozen_after)
    assert mock_trainer.clock.epoch == 2
    assert mock_trainer.clock.step == 16
    # 16 steps / accumulation 4 = 4 optimizer iterations
    assert mock_trainer.clock.iteration == 4


def test_warmup_learning_rate(mock_trainer: MockTrainer) -> None:
    # warmup is 20 iterations × grad accumulation 4 = 80 scheduler steps
    mock_trainer._scheduler_steps = 8
    assert mock_trainer.current_learning_rate() == pytest.approx(1.0 * 8 / 80)
    mock_trainer._scheduler_steps = 200
    assert mock_trainer.current_learning_rate() == pytest.approx(1.0)


def test_gradient_accumulation_equivalence(mock_config: MockConfig) -> None:
    """Accumulated gradients over N steps match one big-batch gradient."""
    trainer = MockTrainer(config=mock_config)
    batches = trainer.create_data_iterable()[:4]

    def loss(m: fl.Chain, xs, ys) -> jax.Array:
        return sum(jnp.mean((m(x) - y) ** 2) for x, y in zip(xs, ys)) / 4

    expected = jax.grad(lambda m: loss(m, [b.inputs for b in batches], [b.targets for b in batches]))(
        trainer.mock_model
    )
    for b in batches:
        _, grads = trainer._loss_and_grad(b)
        trainer._last_grads = grads
        trainer.clock.num_minibatches_processed += 0  # backward() handles counting
        # manual accumulation mirroring backward() without the optimizer step
        g = jax.tree.map(lambda v: v / 4, grads["mock_model"])
        item = trainer.models["mock_model"]
        item.grad_accum = g if item.grad_accum is None else jax.tree.map(jnp.add, item.grad_accum, g)
    got = trainer.models["mock_model"].grad_accum
    np.testing.assert_allclose(
        np.asarray(got[0].weight), np.asarray(expected[0].weight), atol=1e-6
    )


def test_seed_reproducibility(mock_config: MockConfig) -> None:
    from refiners_tpu.training_utils import seed_everything

    mock_config.training.duration = Epoch(1)
    seed_everything(0)
    t1 = MockTrainer(config=mock_config)
    seed_everything(0)
    t2 = MockTrainer(config=mock_config)
    t1.train()
    t2.train()
    np.testing.assert_array_equal(
        np.asarray(t1.mock_model[0].weight), np.asarray(t2.mock_model[0].weight)
    )


def test_callback_registration_and_event_order(mock_config: MockConfig) -> None:
    """Mirrors reference test_trainer.py:240 — registered callbacks fire, in
    lifecycle order, with the trainer as argument."""
    from refiners_tpu.training_utils import Callback, CallbackConfig, register_callback

    events: list[str] = []

    class RecorderConfig(CallbackConfig):
        pass

    class Recorder(Callback["MockTrainerWithCallback"]):
        def on_train_begin(self, trainer) -> None:
            events.append("train_begin")

        def on_epoch_begin(self, trainer) -> None:
            events.append("epoch_begin")

        def on_step_end(self, trainer) -> None:
            events.append("step_end")

        def on_train_end(self, trainer) -> None:
            events.append("train_end")

    class RecorderTrainerConfig(MockConfig):
        recorder: RecorderConfig = RecorderConfig()

    class MockTrainerWithCallback(MockTrainer):
        @register_callback()
        def recorder(self, config: RecorderConfig) -> Recorder:
            return Recorder()

    config = RecorderTrainerConfig.load_from_toml(Path(__file__).parent / "mock_config.toml")
    config.training.duration = Epoch(1)
    trainer = MockTrainerWithCallback(config=config)
    assert "recorder" in trainer.callbacks
    trainer.train()
    assert events[0] == "train_begin"
    assert events[1] == "epoch_begin"
    assert events.count("step_end") == 8  # 8 batches x 1 epoch
    assert events[-1] == "train_end"


def test_human_readable_number() -> None:
    from refiners_tpu.training_utils import human_readable_number

    assert human_readable_number(123) == "123.0"
    assert human_readable_number(1234) == "1.2K"
    assert human_readable_number(1234567) == "1.2M"
    assert human_readable_number(1234567890) == "1.2G"


def test_count_learnable_parameters() -> None:
    from refiners_tpu.training_utils.common import count_learnable_parameters

    arrays = [jnp.zeros((10, 10)), jnp.zeros((5,)), jnp.zeros((2, 3, 4))]
    assert count_learnable_parameters(arrays) == 100 + 5 + 24


def test_per_model_learning_rate_override(mock_config: MockConfig) -> None:
    """A model-level learning_rate overrides [optimizer].learning_rate."""
    mock_config.training.duration = Step(4)
    mock_config.training.gradient_accumulation = Step(1)
    mock_config.mock_model.learning_rate = 0.0  # freeze via lr, not requires_grad
    trainer = MockTrainer(config=mock_config)
    before = np.asarray(trainer.mock_model[0].weight).copy()
    trainer.train()
    after = np.asarray(trainer.mock_model[0].weight)
    np.testing.assert_allclose(before, after, atol=1e-12)


def test_gradient_clipping_bounds_update(mock_config: MockConfig) -> None:
    """With SGD lr=1 and max_norm=1e-3, one iteration's update norm is <= 1e-3
    (plus warmup scaling); without clipping it is much larger."""
    mock_config.training.duration = Step(1)
    mock_config.training.gradient_accumulation = Step(1)
    mock_config.lr_scheduler.warmup = Step(0)
    mock_config.optimizer.weight_decay = 0.0  # isolate clipping from decoupled decay

    def one_step(max_norm: float | None) -> float:
        mock_config.training.gradient_clipping_max_norm = max_norm
        trainer = MockTrainer(config=mock_config)
        before = np.asarray(trainer.mock_model[0].weight).copy()
        trainer.train()
        return float(np.linalg.norm(np.asarray(trainer.mock_model[0].weight) - before))

    clipped = one_step(1e-3)
    unclipped = one_step(None)
    assert clipped <= 1.1e-3
    assert unclipped > 10 * clipped


def test_trainer_without_learnable_parameters_raises(mock_config: MockConfig) -> None:
    mock_config.mock_model.requires_grad = False
    trainer = MockTrainer(config=mock_config)
    with pytest.raises(AssertionError, match="learnable"):
        trainer.train()
