"""MVANet building blocks.

Reference: /root/reference/src/refiners/foundationals/swin/mvanet/utils.py.
Feature maps are NHWC (multi-view stacks are (B, V, H, W, C)); sequence
tensors keep the reference's seq-first (L, B, C) layout so checkpoints and
attention semantics transfer unchanged.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion import rng


class Unflatten(fl.Module):
    def __init__(self, dim: int, sizes: tuple[int, ...]) -> None:
        super().__init__()
        self.dim = dim
        self.sizes = sizes

    def forward(self, x: jax.Array) -> jax.Array:
        dim = self.dim % x.ndim
        return x.reshape(*x.shape[:dim], *self.sizes, *x.shape[dim + 1 :])


class Interpolate(fl.Module):
    """Fixed-size NHWC resize."""

    def __init__(self, size: tuple[int, ...], mode: str = "bilinear") -> None:
        super().__init__()
        self.size = tuple(size)
        self.mode = mode

    def forward(self, x: jax.Array) -> jax.Array:
        from refiners_tpu.fluxion.utils import interpolate

        return interpolate(x, self.size, mode=self.mode)  # type: ignore[arg-type]


class Rescale(fl.Module):
    """Scale-factor NHWC resize."""

    def __init__(self, scale_factor: float, mode: str = "nearest") -> None:
        super().__init__()
        self.scale_factor = scale_factor
        self.mode = mode

    def forward(self, x: jax.Array) -> jax.Array:
        from refiners_tpu.fluxion.utils import interpolate

        h = int(x.shape[1] * self.scale_factor)
        w = int(x.shape[2] * self.scale_factor)
        return interpolate(x, (h, w), mode=self.mode)


class BatchNorm2d(fl.WeightedModule):
    """Inference-mode batch norm over the channel (last) axis."""

    def __init__(self, num_features: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__()
        self.num_features = num_features
        self.eps = 1e-5
        dtype = dtype or jnp.float32
        self.weight = jnp.ones((num_features,), dtype=dtype)
        self.bias = jnp.zeros((num_features,), dtype=dtype)
        self.running_mean = jnp.zeros((num_features,), dtype=dtype)
        self.running_var = jnp.ones((num_features,), dtype=dtype)
        self.num_batches_tracked = jnp.zeros((), dtype=jnp.int32)  # checkpoint-layout parity

    def forward(self, x: jax.Array) -> jax.Array:
        inv = jax.lax.rsqrt(self.running_var.astype(jnp.float32) + self.eps)
        y = (x.astype(jnp.float32) - self.running_mean) * inv * self.weight + self.bias
        return y.astype(x.dtype)


class PReLU(fl.WeightedModule, fl.Activation):
    def __init__(self, device: Any = None, dtype: Any = None) -> None:
        super().__init__()
        self.weight = jnp.full((1,), 0.25, dtype=dtype or jnp.float32)

    def forward(self, x: jax.Array) -> jax.Array:
        return jnp.where(x >= 0, x, self.weight.astype(x.dtype) * x)


class PatchSplit(fl.Chain):
    """(B, H, W, C) → (B, 4, H/2, W/2, C)."""

    def __init__(self) -> None:
        super().__init__(
            Unflatten(1, (2, -1)),
            Unflatten(3, (2, -1)),
            fl.Permute(0, 1, 3, 2, 4, 5),
            fl.Flatten(1, 2),
        )


class PatchMerge(fl.Chain):
    """(B, 4, H, W, C) → (B, 2H, 2W, C)."""

    def __init__(self) -> None:
        super().__init__(
            Unflatten(1, (2, 2)),
            fl.Permute(0, 1, 3, 2, 4, 5),
            fl.Flatten(1, 2),
            fl.Flatten(2, 3),
        )


class FeedForward(fl.Residual):
    def __init__(self, emb_dim: int, device: Any = None) -> None:
        super().__init__(
            fl.Linear(in_features=emb_dim, out_features=2 * emb_dim, device=device),
            fl.ReLU(),
            fl.Linear(in_features=2 * emb_dim, out_features=emb_dim, device=device),
        )


class _GetArgs(fl.Parallel):
    def __init__(self, n: int) -> None:
        super().__init__(
            fl.Chain(fl.GetArg(0), fl.Slicing(dim=0, start=n, end=n + 1), fl.Squeeze(0)),
            fl.Chain(fl.GetArg(1), fl.Slicing(dim=0, start=n, end=n + 1), fl.Squeeze(0)),
            fl.Chain(fl.GetArg(1), fl.Slicing(dim=0, start=n, end=n + 1), fl.Squeeze(0)),
        )


class MultiheadAttention(fl.WeightedModule):
    """torch-compatible MHA over seq-first (L, B, C) tensors.

    Weights keep the torch layouts (`in_proj_weight` (3C, C)) so checkpoints
    convert by key only.
    """

    def __init__(self, embedding_dim: int, num_heads: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__()
        self.embedding_dim = embedding_dim
        self.num_heads = num_heads
        dtype = dtype or jnp.float32
        bound = 1.0 / math.sqrt(embedding_dim)
        self.in_proj_weight = rng.init_uniform((3 * embedding_dim, embedding_dim), bound, dtype=dtype)
        self.in_proj_bias = jnp.zeros((3 * embedding_dim,), dtype=dtype)
        self.out_proj = fl.Linear(embedding_dim, embedding_dim, device=device, dtype=dtype)

    @property
    def weight(self) -> jax.Array:  # type: ignore[override]
        return self.in_proj_weight

    def forward(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        L, B, C = q.shape
        S = k.shape[0]
        h, dh = self.num_heads, C // self.num_heads
        wq, wk, wv = jnp.split(self.in_proj_weight, 3, axis=0)
        bq, bk, bv = jnp.split(self.in_proj_bias, 3, axis=0)
        qp = (q @ wq.T + bq).reshape(L, B * h, dh).transpose(1, 0, 2)
        kp = (k @ wk.T + bk).reshape(S, B * h, dh).transpose(1, 0, 2)
        vp = (v @ wv.T + bv).reshape(S, B * h, dh).transpose(1, 0, 2)
        logits = jnp.einsum("bld,bsd->bls", qp / math.sqrt(dh), kp, preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bls,bsd->bld", weights, vp).transpose(1, 0, 2).reshape(L, B, C)
        return self.out_proj(out)


class PatchwiseCrossAttention(fl.Chain):
    """(4, HW, B, C) × (4, HW', B, C) → (4, HW, B, C)."""

    def __init__(self, d_model: int, num_heads: int, device: Any = None) -> None:
        super().__init__(
            fl.Concatenate(
                *(
                    fl.Chain(
                        _GetArgs(n),
                        MultiheadAttention(d_model, num_heads, device=device),
                    )
                    for n in range(4)
                ),
            ),
            Unflatten(0, (4, -1)),
        )


class Pool(fl.Module):
    def __init__(self, ratio: int) -> None:
        super().__init__()
        self.ratio = ratio

    def forward(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        assert h % self.ratio == 0 and w % self.ratio == 0
        r = self.ratio
        pooled = x.reshape(b, h // r, r, w // r, r, c).mean(axis=(2, 4))
        return pooled.reshape(b, 1, h // r, w // r, c)


class MultiPool(fl.Concatenate):
    """NHWC input → (B, sum(h'w'), 1, C) pooled sequence stack."""

    def __init__(self, pool_ratios: list[int]) -> None:
        super().__init__(
            *(
                fl.Chain(
                    Pool(pool_ratio),
                    fl.Flatten(2, 3),  # (B, 1, h'w', C)
                    fl.Permute(0, 2, 1, 3),  # (B, h'w', 1, C)
                )
                for pool_ratio in pool_ratios
            ),
            dim=1,
        )
