"""HuggingFace datasets integration.

Reference: /root/reference/src/refiners/training_utils/huggingface_datasets.py (:26-36).
"""

from __future__ import annotations

from typing import Any, Generic, Protocol, TypeVar

from pydantic import BaseModel, ConfigDict

T = TypeVar("T", covariant=True)


class HuggingfaceDataset(Generic[T], Protocol):
    def __getitem__(self, index: int) -> T: ...

    def __len__(self) -> int: ...


class HuggingfaceDatasetConfig(BaseModel):
    hf_repo: str
    revision: str = "main"
    split: str = "train"
    horizontal_flip_probability: float = 0.0
    random_crop_size: int | None = None
    resize_image_min_size: int = 512
    resize_image_max_size: int = 576
    caption_key: str = "caption"

    model_config = ConfigDict(extra="forbid")


def load_hf_dataset(path: str, revision: str = "main", split: str = "train", use_verification: bool = False) -> Any:
    import datasets  # type: ignore

    return datasets.load_dataset(path, revision=revision, split=split)  # type: ignore[no-untyped-call]
