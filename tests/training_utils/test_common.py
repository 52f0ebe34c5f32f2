"""Time-value mini-language and seeding semantics
(reference tests/training_utils/test_common.py)."""

import random

import pytest

from refiners_tpu.training_utils import Epoch, Iteration, Step, scoped_seed
from refiners_tpu.training_utils.common import TimeValue, parse_number_unit_field


@pytest.mark.parametrize(
    "value, expected",
    [
        ("10: step", Step(10)),
        ("20 :epoch", Epoch(20)),
        ("30: Iteration", Iteration(30)),
        (50, Step(50)),
        (Iteration(7), Iteration(7)),
    ],
)
def test_parse_number_unit_field(value, expected) -> None:
    assert parse_number_unit_field(value) == expected


@pytest.mark.parametrize("invalid", ["10", "10:minute", {"number": 1}, None, 1.5])
def test_parse_number_unit_field_invalid(invalid) -> None:
    with pytest.raises((ValueError, KeyError, TypeError)):
        parse_number_unit_field(invalid)


def test_time_value_ordering_and_str() -> None:
    assert Step(10).number == 10
    assert Step(10).unit is Step or isinstance(Step(10), TimeValue)


def test_scoped_seed_reproducible_and_restores() -> None:
    random.seed(1234)
    baseline_next = random.randint(0, 10**9)

    random.seed(1234)
    with scoped_seed(42):
        a = random.randint(0, 10**9)
    with scoped_seed(42):
        b = random.randint(0, 10**9)
    assert a == b
    # outer RNG stream unaffected by the scoped block
    assert random.randint(0, 10**9) == baseline_next


def test_scoped_seed_callable() -> None:
    with scoped_seed(lambda: 7):
        a = random.randint(0, 10**9)
    with scoped_seed(7):
        b = random.randint(0, 10**9)
    assert a == b
