"""Attention layers.

Reference: /root/reference/src/refiners/fluxion/layers/attentions.py
(:15 scaled_dot_product_attention, :115 ScaledDotProductAttention, :205
Attention, :319 SelfAttention, :388 SelfAttention2d).

TPU-native notes: the compute routes through `refiners_tpu.ops` which
auto-selects a Pallas flash kernel for long sequences; `slice_size` is
accepted for API parity but is a no-op beyond forcing the blockwise kernel —
flash attention is sliced-by-construction with exact softmax.
"""

from __future__ import annotations

import os
from typing import Any

import jax

from refiners_tpu.fluxion.layers.basics import Identity
from refiners_tpu.fluxion.layers.chain import Chain, Distribute, Lambda, Parallel
from refiners_tpu.fluxion.layers.linear import Linear
from refiners_tpu.fluxion.layers.module import Module
from refiners_tpu.ops.attention import (
    dot_product_attention,
    flash_auto,
    merge_heads,
    scaled_dot_product_attention,
    split_heads,
)

__all__ = [
    "scaled_dot_product_attention",
    "ScaledDotProductAttention",
    "Attention",
    "SelfAttention",
    "SelfAttention2d",
]


class ScaledDotProductAttention(Module):
    """Multi-head SDPA over (B, L, H·D) inputs (attentions.py:115)."""

    def __init__(
        self,
        num_heads: int = 1,
        is_causal: bool = False,
        is_optimized: bool = True,
        slice_size: int | None = None,
    ) -> None:
        super().__init__()
        self.num_heads = num_heads
        self.is_causal = is_causal
        self.is_optimized = is_optimized
        self.slice_size = slice_size

    def forward(self, query: jax.Array, key: jax.Array, value: jax.Array) -> jax.Array:
        use_flash = True if self.slice_size is not None else None
        if not self.is_optimized:
            use_flash = False
        if use_flash is None:
            use_flash = flash_auto(query, query.shape[1], key.shape[1])
        if use_flash:
            # packed entry: the kernel's index maps slice heads out of the
            # (B, L, H·D) projection layout directly — no split/merge-heads
            # transposes, and megatron TP's feature sharding flows through.
            # REFINERS_TPU_FLASH_LAYOUT=split routes through the flat 4-D
            # entry instead (program-level A/B of the packed layout).
            if os.environ.get("REFINERS_TPU_FLASH_LAYOUT", "packed") != "split":
                from refiners_tpu.ops.flash_attention import flash_attention_packed

                return flash_attention_packed(
                    query, key, value,
                    is_causal=self.is_causal,
                    head_dim=query.shape[-1] // self.num_heads,
                )
            out = dot_product_attention(
                split_heads(query, self.num_heads),
                split_heads(key, self.num_heads),
                split_heads(value, self.num_heads),
                is_causal=self.is_causal,
                use_flash=True,
            )
            return merge_heads(out)
        q = split_heads(query, self.num_heads)
        k = split_heads(key, self.num_heads)
        v = split_heads(value, self.num_heads)
        out = dot_product_attention(q, k, v, is_causal=self.is_causal, use_flash=False)
        return merge_heads(out)


class Attention(Chain):
    """Q/K/V projections → multi-head SDPA → output projection (attentions.py:205)."""

    def __init__(
        self,
        embedding_dim: int,
        num_heads: int = 1,
        key_embedding_dim: int | None = None,
        value_embedding_dim: int | None = None,
        inner_dim: int | None = None,
        use_bias: bool = True,
        is_causal: bool = False,
        is_optimized: bool = True,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        assert embedding_dim % num_heads == 0, f"embedding_dim {embedding_dim} must be divisible by num_heads {num_heads}"
        self.embedding_dim = embedding_dim
        self.num_heads = num_heads
        self.heads_dim = embedding_dim // num_heads
        self.key_embedding_dim = key_embedding_dim or embedding_dim
        self.value_embedding_dim = value_embedding_dim or embedding_dim
        self.inner_dim = inner_dim or embedding_dim
        self.use_bias = use_bias
        self.is_causal = is_causal
        self.is_optimized = is_optimized
        super().__init__(
            Distribute(
                Linear(self.embedding_dim, self.inner_dim, bias=use_bias, device=device, dtype=dtype),
                Linear(self.key_embedding_dim, self.inner_dim, bias=use_bias, device=device, dtype=dtype),
                Linear(self.value_embedding_dim, self.inner_dim, bias=use_bias, device=device, dtype=dtype),
            ),
            ScaledDotProductAttention(num_heads=num_heads, is_causal=is_causal, is_optimized=is_optimized),
            Linear(self.inner_dim, self.embedding_dim, bias=True, device=device, dtype=dtype),
        )


class SelfAttention(Attention):
    """Attention with Q=K=V=x (attentions.py:319)."""

    def __init__(
        self,
        embedding_dim: int,
        inner_dim: int | None = None,
        num_heads: int = 1,
        use_bias: bool = True,
        is_causal: bool = False,
        is_optimized: bool = True,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__(
            embedding_dim=embedding_dim,
            inner_dim=inner_dim,
            num_heads=num_heads,
            use_bias=use_bias,
            is_causal=is_causal,
            is_optimized=is_optimized,
            device=device,
            dtype=dtype,
        )
        self.insert(0, Parallel(Identity(), Identity(), Identity()))


class SelfAttention2d(SelfAttention):
    """Self-attention over NHWC feature maps (attentions.py:388).

    Channels-last makes the NCHW↔sequence gymnastics of the reference a plain
    reshape; the spatial shape is recorded in the "reshape" context for parity
    with adapters that read it.
    """

    def __init__(
        self,
        channels: int,
        num_heads: int = 1,
        use_bias: bool = True,
        is_causal: bool = False,
        is_optimized: bool = True,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        assert channels % num_heads == 0, f"channels {channels} must be divisible by num_heads {num_heads}"
        self.channels = channels
        super().__init__(
            embedding_dim=channels,
            num_heads=num_heads,
            use_bias=use_bias,
            is_causal=is_causal,
            is_optimized=is_optimized,
            device=device,
            dtype=dtype,
        )

    def init_context(self) -> dict[str, dict[str, Any]]:
        return {"reshape": {"height": None, "width": None}}

    def forward(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        ctx = self.use_context("reshape")
        ctx["height"], ctx["width"] = h, w
        seq = x.reshape(b, h * w, c)
        out = super().forward(seq)
        return out.reshape(b, h, w, c)
