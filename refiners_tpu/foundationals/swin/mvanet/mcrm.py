"""MCRM: Multi-View Complementary Refinement.

Reference: /root/reference/src/refiners/foundationals/swin/mvanet/mcrm.py:63.
Multi-view stacks are (B, V, H, W, C).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl

from refiners_tpu.foundationals.swin.mvanet.utils import (
    FeedForward,
    Interpolate,
    MultiPool,
    PatchMerge,
    PatchSplit,
    PatchwiseCrossAttention,
    Unflatten,
)


class Multiply(fl.Chain):
    def __init__(self, o1: fl.Module, o2: fl.Module) -> None:
        super().__init__(o1, o2)

    def forward(self, *args: jax.Array) -> jax.Array:
        return self[0](*args) * self[1](*args)


class TiledCrossAttention(fl.Chain):
    """Input is (local, global) NHWC multi-view pair (mcrm.py:19)."""

    def __init__(
        self,
        emb_dim: int,
        dim: int,
        num_heads: int = 1,
        pool_ratios: list[int] | None = None,
        device: Any = None,
    ) -> None:
        if pool_ratios is None:
            pool_ratios = [1, 2, 4]

        super().__init__(
            fl.Distribute(
                fl.Chain(  # local (B, 4, h, w, C) → (4, hw, B, C)
                    fl.Flatten(2, 3),
                    fl.Permute(1, 2, 0, 3),
                ),
                fl.Chain(  # global → pooled sequences
                    PatchSplit(),
                    fl.Squeeze(0),
                    MultiPool(pool_ratios),
                ),
            ),
            fl.Sum(
                fl.Chain(
                    fl.GetArg(0),
                    fl.Permute(2, 1, 0, 3),  # (B, hw, 4, C)
                ),
                fl.Chain(
                    PatchwiseCrossAttention(emb_dim, num_heads, device=device),
                    fl.Permute(2, 1, 0, 3),
                ),
            ),
            fl.LayerNorm(emb_dim, device=device),
            FeedForward(emb_dim, device=device),
            fl.LayerNorm(emb_dim, device=device),
            fl.Permute(0, 2, 1, 3),  # (B, 4, hw, C)
            Unflatten(2, (dim, dim)),  # (B, 4, h, w, C)
        )


class MCRM(fl.Chain):
    """Refine local views from the global view and fold back (mcrm.py:63)."""

    def __init__(
        self,
        emb_dim: int,
        size: int,
        num_heads: int = 1,
        pool_ratios: list[int] | None = None,
        device: Any = None,
    ) -> None:
        if pool_ratios is None:
            pool_ratios = [1, 2, 4]

        super().__init__(
            fl.Parallel(
                fl.Chain(fl.Slicing(dim=1, end=4)),  # local
                fl.Chain(fl.Slicing(dim=1, start=4), fl.Squeeze(1)),  # global
            ),
            fl.Parallel(
                Multiply(
                    fl.GetArg(0),
                    fl.Chain(
                        fl.GetArg(1),
                        fl.Conv2d(emb_dim, 1, 1, device=device),
                        fl.Sigmoid(),
                        Interpolate((size * 2, size * 2), "nearest"),
                        PatchSplit(),
                    ),
                ),
                fl.GetArg(1),
            ),
            fl.Parallel(
                TiledCrossAttention(emb_dim, size, num_heads, pool_ratios, device=device),
                fl.GetArg(1),
            ),
            fl.Concatenate(
                fl.GetArg(0),
                fl.Chain(
                    fl.Sum(
                        fl.GetArg(1),
                        fl.Chain(
                            fl.GetArg(0),
                            PatchMerge(),
                            Interpolate((size, size), "nearest"),
                        ),
                    ),
                    fl.Unsqueeze(1),
                ),
                dim=1,
            ),
        )
