"""Inference rewrite passes (chain surgery, reversible).

TPU-native additions with no reference equivalent: structural rewrites that
change how the compiled program maps onto the MXU without changing numerics.

Measure before adopting: on a v5e chip the QKV fusion below made SDXL
30-step diffuse 44% SLOWER (6.56s vs 4.55s) — the wide matmul + split
defeats XLA's native attention fusions. Likewise the GroupNorm+SiLU fusion
measured 18% SLOWER (4.57s vs 3.87s median, interleaved A/B on SDXL 30-step
diffuse): XLA already fuses the normalize+SiLU into the surrounding convs,
and a standalone pallas_call is a fusion barrier. Both passes are provided
because the tradeoff is hardware- and shape-dependent; neither is ever
applied automatically.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.layers.attentions import SelfAttention
from refiners_tpu.fluxion.layers.module import WeightedModule

# int8 weight quantization is the third opt-in rewrite pass (same policy:
# measure on your hardware/shapes before adopting). `quantize_linears(model)`
# swaps every large fl.Linear for an int8 QuantizedLinear in place — weight
# HBM traffic ÷2 vs bf16 — and is exercised end-to-end on the CLIP text
# encoder (tests/fluxion/test_quant.py) and via `bench.py --int8`.
from refiners_tpu.ops.quant import QuantizedLinear, quantize_linears  # noqa: F401  (re-export)


class FusedQKVProjection(WeightedModule):
    """One (in, 3·inner) matmul replacing a Distribute of three Linears.

    Valid only where the three projections consume the *same* input
    (self-attention): the MXU sees one wide matmul instead of three narrow
    ones. `unfuse()` reconstructs the original Linears exactly.
    """

    def __init__(self, q: fl.Linear, k: fl.Linear, v: fl.Linear) -> None:
        super().__init__()
        assert q.in_features == k.in_features == v.in_features
        assert (q.bias is None) == (k.bias is None) == (v.bias is None)
        self.in_features = q.in_features
        self.splits = (q.out_features, q.out_features + k.out_features)
        self.out_features = q.out_features + k.out_features + v.out_features
        self.use_bias = q.bias is not None
        self.weight = jnp.concatenate([q.weight, k.weight, v.weight], axis=1)  # (in, 3·inner)
        if self.use_bias:
            self.bias = jnp.concatenate([q.bias, k.bias, v.bias])

    def forward(self, q_in: jax.Array, k_in: jax.Array, v_in: jax.Array) -> tuple[jax.Array, ...]:
        # precondition (checked at fuse time): self-attention, so all three
        # inputs are the same traced value — project once, split three ways
        y = q_in @ self.weight
        if self.use_bias:
            y = y + self.bias
        q, k, v = jnp.split(y, list(self.splits), axis=-1)
        return (q, k, v)

    def unfuse(self) -> fl.Distribute:
        linears = []
        bounds = (0, *self.splits, self.out_features)
        for i in range(3):
            lo, hi = bounds[i], bounds[i + 1]
            linear = fl.Linear(self.in_features, hi - lo, bias=self.use_bias, dtype=self.weight.dtype)
            linear.weight = self.weight[:, lo:hi]
            if self.use_bias:
                linear.bias = self.bias[lo:hi]
            linears.append(linear)
        return fl.Distribute(*linears)


class FusedGroupNormSiLU(WeightedModule):
    """One Pallas kernel replacing an adjacent GroupNorm→SiLU pair.

    See `refiners_tpu.ops.group_norm` for the kernel design (per-channel
    lane-packed statistics instead of XLA's padded (…, groups, C/groups)
    reduction layout). Shares the GroupNorm's weight/bias arrays, so it can
    be applied after weight loading and reversed exactly by `unfuse()`.

    Measured SLOWER than the XLA path on v5e (see module docstring); apply
    only after measuring on your own hardware/shapes.
    """

    def __init__(self, gn: fl.GroupNorm) -> None:
        super().__init__()
        self.channels = gn.channels
        self.num_groups = gn.num_groups
        self.eps = gn.eps
        self.weight = gn.weight
        self.bias = gn.bias

    def forward(self, x: jax.Array) -> jax.Array:
        from refiners_tpu.ops.group_norm import group_norm_silu

        return group_norm_silu(x, self.weight, self.bias, self.num_groups, self.eps)

    def unfuse(self) -> tuple[fl.GroupNorm, fl.SiLU]:
        gn = fl.GroupNorm(channels=self.channels, num_groups=self.num_groups, eps=self.eps)
        gn.weight = self.weight
        gn.bias = self.bias
        return gn, fl.SiLU()


def fuse_group_norm_silu(root: fl.Chain) -> int:
    """Fuse every GroupNorm whose next sibling is a SiLU under `root`.

    Covers both halves of every UNet/VAE ResidualBlock (GN→SiLU→Conv ×2).
    Apply AFTER loading weights (the fused layer has its own tree path);
    reverse with `unfuse_group_norm_silu` before saving state dicts.
    """
    count = 0
    for gn, parent in list(root.walk(fl.GroupNorm, recurse=True)):
        siblings = list(parent)
        idx = next(i for i, m in enumerate(siblings) if m is gn)
        if idx + 1 >= len(siblings) or type(siblings[idx + 1]) is not fl.SiLU:
            continue
        parent.remove(siblings[idx + 1])
        parent.replace(gn, FusedGroupNormSiLU(gn))
        count += 1
    return count


def unfuse_group_norm_silu(root: fl.Chain) -> int:
    """Reverse `fuse_group_norm_silu`."""
    count = 0
    for fused, parent in list(root.walk(FusedGroupNormSiLU, recurse=True)):
        siblings = list(parent)
        idx = next(i for i, m in enumerate(siblings) if m is fused)
        gn, silu = fused.unfuse()
        parent.replace(fused, gn)
        parent.insert(idx + 1, silu)
        count += 1
    return count


def fuse_qkv_projections(root: fl.Chain) -> int:
    """Fuse every eligible self-attention QKV Distribute under `root`.

    Skips attentions whose projections are adapted (e.g. LoRA-wrapped) or
    otherwise non-plain. Returns the number of fused attentions.
    """
    count = 0
    for attn, _ in list(root.walk(SelfAttention, recurse=True)):
        distribute = attn.find(fl.Distribute)
        if distribute is None or len(list(distribute)) != 3:
            continue
        q, k, v = list(distribute)
        if not all(type(m) is fl.Linear for m in (q, k, v)):
            continue
        if not (q.in_features == k.in_features == v.in_features and (q.bias is None) == (k.bias is None) == (v.bias is None)):
            continue
        attn.replace(distribute, FusedQKVProjection(q, k, v))
        count += 1
    return count


def unfuse_qkv_projections(root: fl.Chain) -> int:
    """Reverse `fuse_qkv_projections`."""
    count = 0
    for fused, parent in list(root.walk(FusedQKVProjection, recurse=True)):
        parent.replace(fused, fused.unfuse())
        count += 1
    return count
