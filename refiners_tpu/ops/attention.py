"""Scaled dot-product attention: XLA reference path + Pallas flash kernel.

Replaces the reference's torch-SDPA wrapper and its sliced-attention fallback
(/root/reference/src/refiners/fluxion/layers/attentions.py:15-155). On TPU the
flash kernel is blockwise by construction — it already bounds memory at
O(block²) instead of O(L²); the XLA path additionally auto-slices its query
dim above `_XLA_SLICE_BYTES` of logits, so even the no-flash (f32 parity)
program is memory-bounded at deployment shapes.

Layout: (batch, num_heads, seq, head_dim) for the 4-D entry points.
"""

from __future__ import annotations

import contextlib
import functools
import math
import os
from typing import Iterator

import jax
import jax.numpy as jnp

# Flash kernel threshold, set by end-to-end A/B on a v5e chip with honest
# host-fetch timing (SDXL 1024², 30-step diffuse): no flash 4.95s, flash at
# >=4096 4.69s, flash at >=1024 4.57s. Below 1024 the L² buffer fits in
# VMEM-resident fusions and launch overhead dominates.
_FLASH_MIN_SEQ = int(os.environ.get("REFINERS_TPU_FLASH_MIN_SEQ", "1024"))

# test/deployment override for the auto-selection: None = auto (backend +
# sequence-length heuristics), True/False = force. Set via `force_flash`.
_FLASH_OVERRIDE: bool | None = None


@contextlib.contextmanager
def force_flash(enabled: bool = True) -> Iterator[None]:
    """Force the flash path on (or off) for every auto-selected call site.

    Off-TPU the kernels run through the Pallas interpreter (see
    `flash_attention._interpret`), so `force_flash()` lets the full
    flash-in-model program — including its mesh-sharded composition — execute
    and be verified on the CPU backend. Applies at TRACE time: enter the
    context before jit-compiling the program under test.
    """
    global _FLASH_OVERRIDE
    prev = _FLASH_OVERRIDE
    _FLASH_OVERRIDE = enabled
    try:
        yield
    finally:
        _FLASH_OVERRIDE = prev


def flash_auto(x: jax.Array, *seq_lens: int) -> bool:
    """The auto-selection policy: override if set, else backend + seq gates."""
    if _FLASH_OVERRIDE is not None:
        return _FLASH_OVERRIDE
    return all(s >= _FLASH_MIN_SEQ for s in seq_lens) and flash_capable(x)


def flash_auto_relpos(x: jax.Array) -> bool:
    """Selection policy for the decomposed rel-pos kernel: no sequence floor.

    The XLA fallback materializes an O(L²) f32 bias whatever the length —
    at SAM's windowed layers (seq 196 × 400 batch·head rows) that is ~61 MB
    of logits+bias traffic per layer, which the kernel never writes — so the
    kernel is selected at every sequence length (A/B in docs/performance.md)."""
    if _FLASH_OVERRIDE is not None:
        return _FLASH_OVERRIDE
    return flash_capable(x)


def flash_capable(x: jax.Array) -> bool:
    """True when the Pallas TPU kernel can COMPILE for `x`'s execution target.

    `jax.default_backend()` alone is wrong in mixed-device processes: under
    ``jax.default_device(cpu)`` on a TPU-default process the op runs on CPU
    arrays, where Pallas only supports interpret mode. Eager arrays report
    their actual device. Tracers carry no device, so we fall back to the
    default backend — a HEURISTIC, not the true jit compile target: a program
    compiled for CPU inside a TPU-default process would still auto-select the
    kernel. CPU-facing paths that jit under such a process must pass
    `use_flash=False` explicitly. Only `platform == "tpu"` selects the kernel
    (the kernel is pltpu-specific; a GPU backend must not pick it up).
    """
    try:
        devices = x.devices()  # concrete arrays only
    except Exception:
        return jax.default_backend() == "tpu"
    return all(d.platform == "tpu" for d in devices)


# Auto-slice the XLA path's query dim when the f32 logits buffer would exceed
# this. The reference bounds the same buffer with user-set `slice_size`
# (attentions.py:135-155); here it is automatic and row-exact — chunking only
# partitions softmax rows (observed ≤1 ULP from XLA reassociating reductions
# across shapes). Sized so SDXL-1024² f32 (2·10·4096² logits = 1.34 GB
# per op) fits next to 10.6 GB of f32 weights on a 16 GB chip.
_XLA_SLICE_BYTES = 256 * 1024 * 1024


def _xla_attention_dense(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None,
    causal_offset: jax.Array | None,
    scale: float,
) -> jax.Array:
    """Unchunked attention; softmax statistics in float32 for bf16 stability.

    `causal_offset`: global index of q's first row minus (Lk − Lq), or None
    for non-causal — row i attends keys j <= i + offset."""
    logits = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32) * scale
    if causal_offset is not None:
        ql, kl = logits.shape[-2], logits.shape[-1]
        keep = jnp.arange(kl)[None, :] <= jnp.arange(ql)[:, None] + causal_offset
        logits = jnp.where(keep, logits, -jnp.inf)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, -jnp.inf)
        else:
            logits = logits + mask.astype(logits.dtype)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("...qk,...kd->...qd", weights, v, preferred_element_type=q.dtype)


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    is_causal: bool = False,
    scale: float | None = None,
) -> jax.Array:
    """XLA attention, query-sliced when the logits buffer would be large."""
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    lq, lk = q.shape[-2], k.shape[-2]
    batch = math.prod(q.shape[:-2])
    logits_bytes = batch * lq * lk * 4
    causal0 = jnp.asarray(lk - lq) if is_causal else None
    if logits_bytes <= _XLA_SLICE_BYTES:
        return _xla_attention_dense(q, k, v, mask, causal0, scale)

    n_chunks = min(lq, -(-logits_bytes // _XLA_SLICE_BYTES))
    while lq % n_chunks:  # need equal chunks for lax.map
        n_chunks += 1
    chunk = lq // n_chunks
    qs = jnp.moveaxis(q.reshape(*q.shape[:-2], n_chunks, chunk, q.shape[-1]), -3, 0)
    starts = jnp.arange(n_chunks) * chunk
    # mask rows chunk along -2 only when the mask actually spans Lq
    mask_chunked = mask is not None and mask.ndim >= 2 and mask.shape[-2] == lq
    ms = None
    if mask_chunked:
        assert mask is not None
        ms = jnp.moveaxis(mask.reshape(*mask.shape[:-2], n_chunks, chunk, mask.shape[-1]), -3, 0)

    def one(args: tuple[jax.Array, ...]) -> jax.Array:
        if mask_chunked:
            qc, start, mc = args
        else:
            qc, start = args
            mc = mask
        offset = (start + (lk - lq)) if is_causal else None
        return _xla_attention_dense(qc, k, v, mc, offset, scale)

    outs = jax.lax.map(one, (qs, starts, ms) if mask_chunked else (qs, starts))
    return jnp.moveaxis(outs, 0, -3).reshape(*q.shape)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    is_causal: bool = False,
    scale: float | None = None,
    use_flash: bool | None = None,
) -> jax.Array:
    """Attention over (B, H, Lq, D)/(B, H, Lk, D) tensors.

    `use_flash=None` auto-selects the Pallas flash kernel for long sequences
    on TPU; `False` forces the XLA einsum path (used for parity tests).
    """
    assert q.ndim == 4, f"expected (B, H, L, D), got {q.shape}"
    if use_flash is None:
        use_flash = flash_auto(q, q.shape[-2], k.shape[-2])
    if use_flash:
        from refiners_tpu.ops.flash_attention import flash_attention

        bias = mask
        if bias is not None and bias.dtype == jnp.bool_:
            # boolean keep-mask → large negative additive bias. Masked
            # positions get exactly zero weight PROVIDED at least one key in
            # the row survives; a row whose keys are ALL masked degenerates to
            # uniform attention here (every score ties at -1e30) where the
            # XLA path would return NaN. No model in the zoo emits such rows.
            bias = jnp.where(bias, 0.0, -1e30).astype(jnp.float32)
        return flash_attention(q, k, v, bias=bias, is_causal=is_causal, scale=scale)
    return _xla_attention(q, k, v, mask=mask, is_causal=is_causal, scale=scale)


def scaled_dot_product_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    attn_mask: jax.Array | None = None,
    is_causal: bool = False,
) -> jax.Array:
    """Reference-compatible entry point (attentions.py:15): accepts 3-D
    (B, L, D) or 4-D (B, H, L, D) tensors."""
    if query.ndim == 3:
        out = dot_product_attention(query[:, None], key[:, None], value[:, None], mask=attn_mask, is_causal=is_causal)
        return out[:, 0]
    return dot_product_attention(query, key, value, mask=attn_mask, is_causal=is_causal)


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, L, H·D) → (B, H, L, D)."""
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, L, D) → (B, L, H·D)."""
    b, h, l, d = x.transpose(0, 2, 1, 3).shape  # noqa: F841 — readability
    return x.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[2], x.shape[1] * x.shape[3])
