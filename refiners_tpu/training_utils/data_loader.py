"""Data loading.

Reference: /root/reference/src/refiners/training_utils/data_loader.py (:10-60).
Pure-python loader (no torch dependency in the core): shuffled batching over a
`get_item` callable with an optional collate function. TPU input pipelines
should keep host-side work light and feed device arrays per step.
"""

from __future__ import annotations

import random
from typing import Callable, Generic, Iterator, TypeVar

from pydantic import BaseModel, ConfigDict, NonNegativeInt, PositiveInt, model_validator

BatchT = TypeVar("BatchT")


class DataLoaderConfig(BaseModel):
    batch_size: PositiveInt = 1
    num_workers: NonNegativeInt = 0
    pin_memory: bool = False
    prefetch_factor: PositiveInt | None = None
    persistent_workers: bool = False
    drop_last: bool = False
    shuffle: bool = True

    model_config = ConfigDict(extra="forbid")

    @model_validator(mode="after")
    def check_prefetch_factor(self) -> "DataLoaderConfig":
        if self.prefetch_factor is not None and self.num_workers == 0:
            raise ValueError(f"prefetch_factor={self.prefetch_factor} requires num_workers > 0")
        return self

    @model_validator(mode="after")
    def check_num_workers(self) -> "DataLoaderConfig":
        if self.num_workers == 0 and self.persistent_workers is True:
            raise ValueError(f"persistent_workers={self.persistent_workers} option needs num_workers > 0")
        return self


class DatasetFromCallable(Generic[BatchT]):
    """Wrap a `get_item` callable as a sized dataset (data_loader.py:34)."""

    def __init__(self, get_item: Callable[[int], BatchT], length: int) -> None:
        assert length > 0, "Dataset length must be greater than 0."
        self.length = length
        self.get_item = get_item

    def __getitem__(self, index: int) -> BatchT:
        return self.get_item(index)

    def __len__(self) -> int:
        return self.length


class DataLoader(Generic[BatchT]):
    def __init__(
        self,
        dataset: DatasetFromCallable[BatchT],
        config: DataLoaderConfig,
        collate_fn: Callable[[list[BatchT]], BatchT] | None = None,
    ) -> None:
        self.dataset = dataset
        self.config = config
        self.collate_fn = collate_fn

    def __iter__(self) -> Iterator[BatchT]:
        indices = list(range(len(self.dataset)))
        if self.config.shuffle:
            random.shuffle(indices)
        bs = self.config.batch_size
        for i in range(0, len(indices), bs):
            chunk = indices[i : i + bs]
            if self.config.drop_last and len(chunk) < bs:
                return
            items = [self.dataset[j] for j in chunk]
            yield self.collate_fn(items) if self.collate_fn else (items[0] if bs == 1 else items)  # type: ignore[misc]

    def __len__(self) -> int:
        n = len(self.dataset)
        bs = self.config.batch_size
        return n // bs if self.config.drop_last else -(-n // bs)


def create_data_loader(
    get_item: Callable[[int], BatchT],
    length: int,
    config: DataLoaderConfig,
    collate_fn: Callable[[list[BatchT]], BatchT] | None = None,
) -> DataLoader[BatchT]:
    return DataLoader(DatasetFromCallable(get_item, length), config, collate_fn=collate_fn)
