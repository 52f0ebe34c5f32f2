"""Pallas TPU flash attention (forward) with online softmax.

Design (see /opt/skills/guides/pallas_guide.md):
- Grid: (batch·heads, Lq/BLOCK_Q). Each program streams K/V for one head in
  BLOCK_K chunks through VMEM, keeping running max/sum statistics in f32 —
  memory is O(BLOCK_Q·BLOCK_K), never O(L²). This subsumes the reference's
  "sliced attention" (attentions.py:135-155) at zero quality cost.
- QK^T and PV ride the MXU with f32 accumulation (`preferred_element_type`);
  inputs stay bf16 end-to-end.
- head_dim is zero-padded to a lane multiple (128) in the wrapper: zero tail
  columns change neither QK^T nor the valid slice of PV.
- Sequence tails are masked with -inf via static block masks (shapes are
  static under jit, so masks specialize at trace time).

Backward: `flash_attention` carries a custom VJP that recomputes attention
with the XLA einsum path — correct gradients, flash-fast inference. A fused
Pallas backward is a planned optimization.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG_INF = -1e30
# tile sizes tuned end-to-end on v5e (SDXL 1024², 30-step diffuse, honest
# host-fetch timing): 512/512 → 4.55s, 512/1024 → 3.88s, 512/2048 → 3.83s;
# 1024/1024 and 512/4096 fall off a VMEM cliff (~6.0s). Larger K blocks mean
# fewer sequential grid steps between scratch carries.
_BLOCK_Q = 512
_BLOCK_K = 2048


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    scale: float,
    block_k: int,
    kv_len: int,
    q_len: int,
    block_q: int,
    num_k_blocks: int,
    is_causal: bool,
):
    """One (head, q-block, k-block) program step.

    The grid's k dimension is sequential ("arbitrary"), so the online-softmax
    statistics live in VMEM scratch and carry across k steps; K/V blocks
    stream from HBM one (block_k, d) tile at a time — VMEM stays
    O(block_q·d + block_k·d) regardless of sequence length.
    """
    q_blk = pl.program_id(1)
    k_blk = pl.program_id(2)

    @pl.when(k_blk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    k = k_ref[0].astype(jnp.float32)  # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)

    col = k_blk * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col < kv_len
    if is_causal:
        row = q_blk * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        mask = jnp.logical_and(mask, col <= row + (kv_len - q_len))
    s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_ref[...][:, :1]
    l_prev = l_ref[...][:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(k_blk == num_k_blocks - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] / l_ref[...][:, :1]).astype(o_ref.dtype)


def _flash_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, is_causal: bool, scale: float | None
) -> jax.Array:
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    block_q = min(_BLOCK_Q, _round_up(lq, _LANE))
    block_k = min(_BLOCK_K, _round_up(lk, _LANE))
    d_pad = _round_up(d, _LANE)
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)

    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    if d_pad != d or lq_pad != lq:
        qf = jnp.pad(qf, ((0, 0), (0, lq_pad - lq), (0, d_pad - d)))
    if d_pad != d or lk_pad != lk:
        kf = jnp.pad(kf, ((0, 0), (0, lk_pad - lk), (0, d_pad - d)))
        vf = jnp.pad(vf, ((0, 0), (0, lk_pad - lk), (0, d_pad - d)))

    num_k_blocks = lk_pad // block_k
    grid = (b * h, lq_pad // block_q, num_k_blocks)
    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        block_k=block_k,
        kv_len=lk,
        q_len=lq,
        block_q=block_q,
        num_k_blocks=num_k_blocks,
        is_causal=is_causal,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, n: (i, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, n: (i, n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),  # running max
            pltpu.VMEM((block_q, _LANE), jnp.float32),  # running sum
            pltpu.VMEM((block_q, d_pad), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * lk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
    )(qf, kf, vf)
    return out[:, :lq, :d].reshape(b, h, lq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, is_causal: bool = False, scale: float | None = None
) -> jax.Array:
    """Flash attention over (B, H, L, D); bf16-friendly, O(L) memory."""
    return _flash_forward(q, k, v, is_causal, scale)


def _fwd(q, k, v, is_causal, scale):
    return _flash_forward(q, k, v, is_causal, scale), (q, k, v)


def _bwd(is_causal, scale, res, g):
    from refiners_tpu.ops.attention import _xla_attention

    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, is_causal=is_causal, scale=scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
