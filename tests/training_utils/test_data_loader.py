"""Data loader semantics (reference tests/training_utils/test_data_loader.py)."""

import numpy as np
import pytest

from refiners_tpu.training_utils import DataLoaderConfig, DatasetFromCallable, create_data_loader


def _get_item(i: int) -> np.ndarray:
    return np.full((2,), float(i), dtype=np.float32)


def test_dataloader_config_invalid() -> None:
    with pytest.raises(Exception):
        DataLoaderConfig(batch_size=0)
    with pytest.raises(Exception):
        DataLoaderConfig(not_a_field=1)


def test_dataset_from_callable() -> None:
    ds = DatasetFromCallable(_get_item, 10)
    assert len(ds) == 10
    np.testing.assert_array_equal(ds[3], np.asarray([3.0, 3.0], dtype=np.float32))
    with pytest.raises(AssertionError):
        DatasetFromCallable(_get_item, 0)


def test_create_data_loader_batches() -> None:
    loader = create_data_loader(_get_item, 10, DataLoaderConfig(batch_size=4, shuffle=False, drop_last=False))
    batches = list(loader)
    sizes = [len(b) for b in batches]
    assert sum(sizes) == 10
    assert sizes[0] == 4


def test_create_data_loader_drop_last_and_shuffle() -> None:
    loader = create_data_loader(_get_item, 10, DataLoaderConfig(batch_size=4, shuffle=True, drop_last=True))
    batches = list(loader)
    assert all(len(b) == 4 for b in batches)
    assert len(batches) == 2


def test_create_data_loader_with_collate_fn() -> None:
    def collate(items):
        return np.stack(items).sum(axis=0)

    loader = create_data_loader(
        _get_item, 4, DataLoaderConfig(batch_size=2, shuffle=False), collate_fn=collate
    )
    first = next(iter(loader))
    np.testing.assert_array_equal(first, np.asarray([1.0, 1.0], dtype=np.float32))  # items 0 + 1
