"""DINOv2-based Fréchet Distance metric.

Reference: /root/reference/src/refiners/training_utils/metrics.py (:44-110).
Representations are computed with the JAX DINOv2 (class embeddings) and the
FD math runs in float64 numpy/scipy-free (eigenvalues via numpy).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Iterable, Protocol

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from refiners_tpu.foundationals import dinov2


class _Sized(Protocol):
    def __len__(self) -> int: ...

    def __getitem__(self, i: int) -> Any: ...


def get_dinov2_representations(
    model: dinov2.ViT,
    batches: Iterable[jax.Array],
) -> np.ndarray:
    """Class-token embeddings for every batch; float64 (metrics.py:10)."""
    reps: list[np.ndarray] = []
    run = jax.jit(lambda m, x: m(x)[:, 0])
    for batch in batches:
        batch_size = batch.shape[0]
        assert batch.shape == (batch_size, 224, 224, 3), f"expected NHWC 224² batches, got {batch.shape}"
        pred = run(model, batch)
        assert pred.shape == (batch_size, model.embedding_dim)
        reps.append(np.asarray(pred, dtype=np.float64))
    return np.concatenate(reps)


def frechet_distance(reps_a: np.ndarray, reps_b: np.ndarray) -> float:
    """Fréchet distance between two representation sets (metrics.py:44)."""
    assert reps_a.ndim == 2 and reps_b.ndim == 2, "representations must have shape (batch, N)"
    assert reps_a.shape[1] == reps_b.shape[1], "representations must have the same dimension"

    mean_a = reps_a.mean(axis=0)
    cov_a = np.cov(reps_a.T)
    mean_b = reps_b.mean(axis=0)
    cov_b = np.cov(reps_b.T)

    # tr(sqrt(A·B)) = sum of square roots of eigenvalues of A·B
    trace = np.real(np.linalg.eigvals(cov_a @ cov_b) ** 0.5).sum()
    return float(((mean_a - mean_b) ** 2).sum() + np.trace(cov_a) + np.trace(cov_b) - 2 * trace)


class DinoDataset:
    def __init__(self, path: str | Path) -> None:
        self.image_paths = sorted(Path(path).glob("*.png"))

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, i: int) -> jax.Array:
        return dinov2.preprocess(Image.open(self.image_paths[i]))


def _batched(dataset: _Sized, batch_size: int) -> Iterable[jax.Array]:
    for i in range(0, len(dataset), batch_size):
        items = [dataset[j] for j in range(i, min(i + batch_size, len(dataset)))]
        yield jnp.stack(items)


def dinov2_frechet_distance(
    dataset_a: _Sized | str | Path,
    dataset_b: _Sized | str | Path,
    model: dinov2.ViT,
    batch_size: int = 64,
) -> float:
    """DINOv2-FD between two datasets (metrics.py:83)."""
    if isinstance(dataset_a, (str, Path)):
        dataset_a = DinoDataset(dataset_a)
    if isinstance(dataset_b, (str, Path)):
        dataset_b = DinoDataset(dataset_b)
    reps_a = get_dinov2_representations(model, _batched(dataset_a, batch_size))
    reps_b = get_dinov2_representations(model, _batched(dataset_b, batch_size))
    return frechet_distance(reps_a, reps_b)
