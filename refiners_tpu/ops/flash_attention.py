"""Pallas TPU flash attention with online softmax — forward AND backward.

Design (see /opt/skills/guides/pallas_guide.md):
- Forward grid: (batch·heads, Lq/BLOCK_Q, Lk/BLOCK_K). Each program streams
  K/V for one head in BLOCK_K chunks through VMEM, keeping running max/sum
  statistics in f32 scratch — memory is O(BLOCK_Q·BLOCK_K), never O(L²).
  This subsumes the reference's "sliced attention"
  (/root/reference/src/refiners/fluxion/layers/attentions.py:135-155) at
  zero quality cost.
- Optional ADDITIVE BIAS (B, H, Lq, Lk) streamed blockwise from HBM: lets
  SAM's decomposed relative-position attention
  (/root/reference/src/refiners/foundationals/segment_anything/image_encoder.py:58)
  and additive attention masks ride the kernel — only the bias itself is
  ever materialized, softmax intermediates stay O(block²).
- QK^T and PV ride the MXU with f32 accumulation (`preferred_element_type`);
  inputs stay bf16 end-to-end.
- head_dim stays compact in HBM (Mosaic pads VMEM tiles internally for
  sub-lane-width minor dims); `_PAD_HEAD_DIM` can re-enable explicit
  zero-padding to 128 lanes — zero tail columns change neither QK^T nor the
  valid slice of PV — as an escape hatch.
- Sequence tails are masked with -inf via static block masks (shapes are
  static under jit, so masks specialize at trace time).

Backward (no-bias path): fused Pallas kernels — dK/dV with the q-loop
sequential, dQ with the k-loop sequential — recomputing P blockwise from the
forward's saved logsumexp, so TRAINING memory is O(L) too (the standard
flash-attention-2 recipe). With a bias operand the VJP falls back to the
XLA einsum recompute (O(L²) — bias gradients need the full score matrix).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

_LANE = 128
_NEG_INF = -1e30
# tile sizes tuned end-to-end on v5e (SDXL 1024², 30-step diffuse, honest
# host-fetch timing): 512/512 → 4.55s, 512/1024 → 3.88s, 512/2048 → 3.83s;
# 1024/1024 and 512/4096 fall off a VMEM cliff (~6.0s). Larger K blocks mean
# fewer sequential grid steps between scratch carries.
_BLOCK_Q = 512
_BLOCK_K = 2048
# with a streamed f32 bias block in VMEM, keep K blocks smaller
_BLOCK_K_BIAS = 1024
# backward blocks: two operands accumulate in f32 scratch, stay conservative
_BLOCK_Q_BWD = 512
_BLOCK_K_BWD = 512
# Whether to zero-pad head_dim up to the 128 lane width in HBM before the
# kernel. Mosaic handles sub-lane-width minor dims natively (it pads VMEM
# tiles internally, HBM stays compact), so explicit padding only adds full
# HBM round-trips of q/k/v (+ an output slice copy) per call. Kept as a
# switch for A/B and as an escape hatch for toolchains where a narrow minor
# dim fails to lower. Env override: REFINERS_TPU_FLASH_PAD_HEAD_DIM=1.
_PAD_HEAD_DIM = os.environ.get("REFINERS_TPU_FLASH_PAD_HEAD_DIM", "0") == "1"

# Whether the inference primal keeps the logsumexp residual output. Off by
# default (the VJP routes through its own forward and always keeps it); =1
# re-enables it for program-level A/B of the no-lse primal.
_PRIMAL_LSE = os.environ.get("REFINERS_TPU_FLASH_PRIMAL_LSE", "0") == "1"

# A/B knob: multiply the packed path's heads-per-program grouping (see
# _packed_n_sub). Default 1 = the tuned minimal grouping.
_NSUB_MULT = int(os.environ.get("REFINERS_TPU_FLASH_NSUB_MULT", "1"))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _vmem_cap(budget_block: int, width: int) -> int:
    """Largest lane-multiple block ≤ the tuned budget_block·LANE byte budget.

    Rounds DOWN: rounding up can exceed the block·width budget by a few
    percent when width doesn't divide budget_block·LANE (e.g. d=160 → +3%),
    and the guard exists because the budget was overrun by only 0.4%."""
    return max(_LANE, (budget_block * _LANE // width) // _LANE * _LANE)


def _interpret() -> bool:
    """Run the kernels through the Pallas interpreter off-TPU.

    This makes the kernels executable (and therefore testable, including
    under mesh sharding) on the CPU backend; on TPU they compile for real.
    Uses the generic ``interpret=True`` interpreter rather than
    ``pltpu.force_tpu_interpret_mode`` because the latter lowers through
    ordered host callbacks, which `custom_partitioning` cannot stage.
    """
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _flash_kernel(
    *refs,
    scale: float,
    block_k: int,
    kv_len: int,
    q_len: int,
    block_q: int,
    num_k_blocks: int,
    is_causal: bool,
    has_bias: bool,
    with_lse: bool,
):
    """One (head, q-block, k-block) program step.

    The grid's k dimension is sequential ("arbitrary"), so the online-softmax
    statistics live in VMEM scratch and carry across k steps; K/V blocks
    stream from HBM one (block_k, d) tile at a time — VMEM stays
    O(block_q·d + block_k·d) regardless of sequence length.

    `with_lse` gates the logsumexp residual output: only the VJP's forward
    needs it, and the (block_q, LANE) f32 broadcast is ~1 GB/step of pure
    HBM writes at SDXL-1024² shapes — the inference primal skips it (a
    pallas_call output can't be DCE'd by XLA, so this must be a kernel
    variant, not an unused result).
    """
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    pos = 3
    bias_ref = None
    if has_bias:
        bias_ref = refs[pos]
        pos += 1
    o_ref = refs[pos]
    pos += 1
    lse_ref = None
    if with_lse:
        lse_ref = refs[pos]
        pos += 1
    m_ref, l_ref, acc_ref = refs[pos:]
    q_blk = pl.program_id(1)
    k_blk = pl.program_id(2)

    @pl.when(k_blk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # operands keep their storage dtype: a bf16×bf16→f32 MXU pass runs at
    # full rate, while casting to f32 first would quarter matmul throughput
    # (f32 matmuls are multi-pass on the MXU). The scale is applied to the
    # f32 scores, not the inputs, so bf16 q loses no mantissa to it.
    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]
    s = (
        jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        * scale
    )  # (block_q, block_k) f32
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)

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
    # p is cast to the value dtype for the PV matmul (the standard TPU flash
    # recipe): the accumulator stays f32, only the probabilities round
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(k_blk == num_k_blocks - 1)
    def _finish():
        l_final = l_ref[...][:, :1]
        o_ref[0] = (acc_ref[...] / l_final).astype(o_ref.dtype)
        if lse_ref is not None:
            # logsumexp residual for the fused backward (f32); rows fully
            # masked (sequence padding) have l=0 → lse=-inf, sliced away
            lse_ref[0] = (m_ref[...] + jnp.log(l_ref[...])).astype(jnp.float32)


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None,
    is_causal: bool,
    scale: float | None,
    with_lse: bool = True,
) -> tuple[jax.Array, jax.Array] | tuple[jax.Array]:
    """Returns (out (B,H,Lq,D), lse (B,H,Lq_pad,LANE) f32), or (out,) when
    `with_lse` is False (the inference primal — skips the residual's HBM
    writes entirely).

    `bias`, when present, must already be materialized at (B, H, Lq, Lk) —
    the public entry broadcasts it so the partitioned op sees a full operand.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    max_block_k = _BLOCK_K_BIAS if bias is not None else _BLOCK_K
    block_q = min(_BLOCK_Q, _round_up(lq, _LANE))
    block_k = min(max_block_k, _round_up(lk, _LANE))
    # VMEM guard: the K/V stream is double-buffered at (block_k, d) tiles, so
    # the tuned 2048-token K block (picked at the transformer's d=64) scales
    # linearly with head_dim — at the VAE's single-head d=512 attention it
    # overflows the 16 MB scoped-VMEM stack (measured: batch-4 decode at
    # seq 16384 needs 16.07 MB). Keep block_k·d at the tuned d≤128 budget.
    if d > _LANE:
        block_k = min(block_k, _vmem_cap(_BLOCK_K, d))
    d_pad = _round_up(d, _LANE) if _PAD_HEAD_DIM else d
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
        has_bias=bias is not None,
        with_lse=with_lse,
    )
    in_specs = [
        pl.BlockSpec((1, block_q, d_pad), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d_pad), lambda i, j, n: (i, n, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d_pad), lambda i, j, n: (i, n, 0), memory_space=pltpu.VMEM),
    ]
    operands: list[jax.Array] = [qf, kf, vf]
    if bias is not None:
        bias_f = bias.reshape(b * h, lq, lk)
        if lq_pad != lq or lk_pad != lk:
            bias_f = jnp.pad(bias_f, ((0, 0), (0, lq_pad - lq), (0, lk_pad - lk)))
        operands.append(bias_f)
        in_specs.append(
            pl.BlockSpec((1, block_q, block_k), lambda i, j, n: (i, j, n), memory_space=pltpu.VMEM)
        )

    out_specs = [pl.BlockSpec((1, block_q, d_pad), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, block_q, _LANE), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((b * h, lq_pad, _LANE), jnp.float32))

    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
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
        interpret=_interpret(),
    )(*operands)
    out = results[0][:, :lq, :d].reshape(b, h, lq, d)
    if not with_lse:
        return (out,)
    return out, results[1].reshape(b, h, lq_pad, _LANE)


# ---------------------------------------------------------------------------
# decomposed relative-position forward (SAM global attention)
# ---------------------------------------------------------------------------


def _flash_relpos_kernel(
    q_ref,
    k_ref,
    v_ref,
    vrel_ref,
    hrel_ref,
    o_ref,
    m_ref,
    l_ref,
    acc_ref,
    *,
    scale: float,
    block_k: int,
    kw: int,
    kv_len: int,
    num_k_blocks: int,
):
    """Flash forward whose bias is the SAM decomposed relative position:
    bias[q, k] = v_rel[q, k // kw] + h_rel[q, k % kw].

    The (block_q, block_k) bias tile is rebuilt on-chip from the two O(L·√L)
    row/column terms with two tiny 0/1-expansion MXU dots (iota comparisons —
    no gathers, no relayouts), so NO O(L²) bias is ever materialized in HBM.
    Materializing it costs ~1 GB f32 per SAM-H global layer (16 heads ×
    4096²) — measured at ~8 ms/layer of broadcast+reshape plus a bias-read-
    bound kernel; this kernel reads 33 MB total instead.
    """
    k_blk = pl.program_id(2)

    @pl.when(k_blk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = (
        jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        * scale
    )  # (block_q, block_k) f32

    # bias tile via expansion dots: E_v[r, j] = [r == (k0 + j) // kw],
    # E_h[c, j] = [c == j % kw] (block_k is a kw multiple, so the global
    # column's modulus equals the tile-local one)
    kh = vrel_ref.shape[-1]
    col = k_blk * block_k + jax.lax.broadcasted_iota(jnp.int32, (kh, block_k), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (kh, block_k), 0)
    e_v = (row_ids == col // kw).astype(jnp.float32)
    colh = jax.lax.broadcasted_iota(jnp.int32, (kw, block_k), 1)
    colh_ids = jax.lax.broadcasted_iota(jnp.int32, (kw, block_k), 0)
    e_h = (colh_ids == colh % kw).astype(jnp.float32)
    bias = jax.lax.dot_general(
        vrel_ref[0].astype(jnp.float32), e_v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        hrel_ref[0].astype(jnp.float32), e_h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + bias
    if kv_len % block_k:  # sequence padding: mask the tail keys
        col_j = k_blk * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col_j < kv_len, s, _NEG_INF)

    m_prev = m_ref[...][:, :1]
    l_prev = l_ref[...][:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(k_blk == num_k_blocks - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] / l_ref[...][:, :1]).astype(o_ref.dtype)


def flash_attention_relpos(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    v_rel: jax.Array,
    h_rel: jax.Array,
    scale: float | None = None,
) -> jax.Array:
    """Flash attention with SAM's decomposed relative-position bias
    (reference image_encoder.py:58-101: logits + v_rel[..., None] +
    h_rel[..., None, :]) computed on-chip — never materialized at O(L²).

    q/k/v: (B, H, L, D) with L = kh·kw; v_rel: (B, H, L, kh) — bias over the
    key row, broadcast over key columns; h_rel: (B, H, L, kw) — bias over the
    key column. Inference primal only (SAM encode is not a training path);
    single-device — the SAM encoder runs unsharded.
    """
    b, h, lq, d = q.shape
    lk = k.shape[2]
    kh = v_rel.shape[-1]
    kw = h_rel.shape[-1]
    assert kh * kw == lk, f"decomposed bias {kh}x{kw} != kv length {lk}"
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    block_q = min(_BLOCK_Q, _round_up(lq, _LANE))
    block_k = min(_BLOCK_K, _round_up(lk, _LANE))
    if d > _LANE:
        block_k = min(block_k, _vmem_cap(_BLOCK_K, d))
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)
    num_k_blocks = lk_pad // block_k
    # the expansion dots need every tile's key columns to share one kw phase:
    # either whole kw rows per tile, or a single tile (then col == j directly,
    # padded tail masked by kv_len) — SAM's windowed layers (lk=196=14²,
    # single 256 block) take the second branch
    if not (block_k % kw == 0 or num_k_blocks == 1):
        bias = (
            v_rel[..., :, None].astype(jnp.float32) + h_rel[..., None, :].astype(jnp.float32)
        ).reshape(b, h, lq, lk)
        return flash_attention(q, k, v, bias=bias, scale=scale)

    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    vrel_f = v_rel.reshape(b * h, lq, kh)
    hrel_f = h_rel.reshape(b * h, lq, kw)
    if lq_pad != lq:
        qf = jnp.pad(qf, ((0, 0), (0, lq_pad - lq), (0, 0)))
        vrel_f = jnp.pad(vrel_f, ((0, 0), (0, lq_pad - lq), (0, 0)))
        hrel_f = jnp.pad(hrel_f, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        kf = jnp.pad(kf, ((0, 0), (0, lk_pad - lk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, lk_pad - lk), (0, 0)))

    kernel = functools.partial(
        _flash_relpos_kernel,
        scale=scale,
        block_k=block_k,
        kw=kw,
        kv_len=lk,
        num_k_blocks=num_k_blocks,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h, lq_pad // block_q, num_k_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, n: (i, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, n: (i, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, kh), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, kw), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * lk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=_interpret(),
    )(qf, kf, vf, vrel_f, hrel_f)
    return out[:, :lq, :].reshape(b, h, lq, d)


# ---------------------------------------------------------------------------
# backward (no-bias path): flash-attention-2 recomputation kernels
# ---------------------------------------------------------------------------


def _recompute_p_ds(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *, scale, block_q, block_k, q_blk, k_blk, q_len, kv_len, is_causal):
    """Shared blockwise recomputation: returns (p, ds) f32 (block_q, block_k).

    Rows beyond q_len and columns beyond kv_len are forced to zero so padded
    regions contribute nothing to the accumulated gradients.
    """
    # native-dtype MXU passes with f32 accumulation (see the forward kernel);
    # the scale multiplies the f32 scores, and the (dsᵀ·q / ds·k) gradient
    # dots fold it back in at their finish step instead of pre-scaling q
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = (
        jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        * scale
    )

    col = k_blk * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    row = q_blk * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    mask = jnp.logical_and(col < kv_len, row < q_len)
    if is_causal:
        mask = jnp.logical_and(mask, col <= row + (kv_len - q_len))

    lse = lse_ref[0][:, :1]  # (block_q, 1) f32
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    delta = delta_ref[0][:, :1]
    ds = p * (dp - delta)
    return p, ds, q, k, do


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale, block_q, block_k, q_len, kv_len, num_q_blocks, is_causal,
):
    k_blk = pl.program_id(1)
    q_blk = pl.program_id(2)

    @pl.when(q_blk == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    p, ds, q, _k, do = _recompute_p_ds(
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
        scale=scale, block_q=block_q, block_k=block_k, q_blk=q_blk, k_blk=k_blk,
        q_len=q_len, kv_len=kv_len, is_causal=is_causal,
    )
    # dv += pᵀ do ; dk += scale·dsᵀ q — p/ds round to the operand dtype for
    # full-rate MXU passes, accumulation stays f32, scale folds in at finish
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(q_blk == num_q_blocks - 1)
    def _finish():
        dk_ref[0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc,
    *, scale, block_q, block_k, q_len, kv_len, num_k_blocks, is_causal,
):
    q_blk = pl.program_id(1)
    k_blk = pl.program_id(2)

    @pl.when(k_blk == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    _p, ds, _q, k, _do = _recompute_p_ds(
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
        scale=scale, block_q=block_q, block_k=block_k, q_blk=q_blk, k_blk=k_blk,
        q_len=q_len, kv_len=kv_len, is_causal=is_causal,
    )
    dq_acc[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(k_blk == num_k_blocks - 1)
    def _finish():
        dq_ref[0] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _flash_backward(
    q: jax.Array, k: jax.Array, v: jax.Array, o: jax.Array, lse: jax.Array, g: jax.Array,
    is_causal: bool, scale: float | None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale_v = scale if scale is not None else 1.0 / math.sqrt(d)

    block_q = min(_BLOCK_Q_BWD, _round_up(lq, _LANE))
    block_k = min(_BLOCK_K_BWD, _round_up(lk, _LANE))
    # VMEM guard for wide heads (see the forward): the backward streams five
    # (block, d) operands plus three f32 accumulators per program
    if d > _LANE:
        cap = _vmem_cap(_BLOCK_K_BWD, d)
        block_q = min(block_q, cap)
        block_k = min(block_k, cap)
    d_pad = _round_up(d, _LANE) if _PAD_HEAD_DIM else d
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)

    # delta = rowsum(dO ∘ O) (f32), padded to the lse layout (BH, Lq_pad, LANE)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # (b, h, lq)
    delta = delta.reshape(b * h, lq)
    delta = jnp.pad(delta, ((0, 0), (0, lq_pad - lq)))[..., None]
    delta = jnp.broadcast_to(delta, (b * h, lq_pad, _LANE))
    # lse arrives 4-D with the forward's padding geometry; flatten heads and
    # re-pad if the backward block sizes differ
    lse = lse.reshape(b * h, lse.shape[2], _LANE)
    if lse.shape[1] != lq_pad:
        lse = lse[:, : min(lse.shape[1], lq_pad)]
        lse = jnp.pad(lse, ((0, 0), (0, lq_pad - lse.shape[1]), (0, 0)), constant_values=0.0)

    def flat_pad(x: jax.Array, length: int, pad_to: int) -> jax.Array:
        xf = x.reshape(b * h, length, d)
        if d_pad != d or pad_to != length:
            xf = jnp.pad(xf, ((0, 0), (0, pad_to - length), (0, d_pad - d)))
        return xf

    qf = flat_pad(q, lq, lq_pad)
    kf = flat_pad(k, lk, lk_pad)
    vf = flat_pad(v, lk, lk_pad)
    gf = flat_pad(g, lq, lq_pad)

    q_spec = pl.BlockSpec((1, block_q, d_pad), lambda i, j, n: (i, n, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, d_pad), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, block_q, _LANE), lambda i, j, n: (i, n, 0), memory_space=pltpu.VMEM)

    num_q_blocks = lq_pad // block_q
    num_k_blocks = lk_pad // block_k

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel,
            scale=scale_v, block_q=block_q, block_k=block_k,
            q_len=lq, kv_len=lk, num_q_blocks=num_q_blocks, is_causal=is_causal,
        ),
        grid=(b * h, num_k_blocks, num_q_blocks),
        in_specs=[q_spec, k_spec, k_spec, q_spec, stat_spec, stat_spec],
        out_specs=(
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, lk_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b * h, lk_pad, d_pad), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * lq * lk * d,
            bytes_accessed=(qf.size + kf.size + vf.size + gf.size) * qf.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=_interpret(),
    )(qf, kf, vf, gf, lse, delta)

    dq_q_spec = pl.BlockSpec((1, block_q, d_pad), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM)
    dq_k_spec = pl.BlockSpec((1, block_k, d_pad), lambda i, j, n: (i, n, 0), memory_space=pltpu.VMEM)
    dq_stat_spec = pl.BlockSpec((1, block_q, _LANE), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM)
    (dq,) = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel,
            scale=scale_v, block_q=block_q, block_k=block_k,
            q_len=lq, kv_len=lk, num_k_blocks=num_k_blocks, is_causal=is_causal,
        ),
        grid=(b * h, num_q_blocks, num_k_blocks),
        in_specs=[dq_q_spec, dq_k_spec, dq_k_spec, dq_q_spec, dq_stat_spec, dq_stat_spec],
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b * h, lq_pad, d_pad), q.dtype),),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * lq * lk * d,
            bytes_accessed=(qf.size + kf.size + vf.size + gf.size) * qf.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=_interpret(),
    )(qf, kf, vf, gf, lse, delta)

    return (
        dq[:, :lq, :d].reshape(b, h, lq, d),
        dk[:, :lk, :d].reshape(b, h, lk, d),
        dv[:, :lk, :d].reshape(b, h, lk, d),
    )


# ---------------------------------------------------------------------------
# packed layout: (B, L, H·D) operands, heads sliced by BlockSpec index maps
# ---------------------------------------------------------------------------
#
# The multi-head layers produce q/k/v as (B, L, H·D) — the raw output of the
# QKV projections. The 4-D entry needs a (B, L, H·D) → (B, H, L, D)
# split-heads transpose per operand and a merge-heads transpose on the
# output: ~8% of SDXL's device time is such boundary data formatting. The
# packed entry instead keeps the operands in projection layout and lets the
# BlockSpec index maps slice head h's D-column window directly out of HBM
# (block index `i % h` along the feature dim) — the kernels are unchanged,
# only the maps differ, and no transpose is ever materialized. Under a
# ("data", "tensor") mesh the packed operands carry the QKV projections'
# natural output sharding P(data, None, tensor), so megatron TP flows into
# the kernel with zero resharding (whole heads per device as long as
# `tensor` divides H).


def _flash_kernel_packed(
    *refs,
    scale: float,
    block_k: int,
    kv_len: int,
    q_len: int,
    block_q: int,
    num_k_blocks: int,
    is_causal: bool,
    with_lse: bool,
    d: int,
    n_sub: int,
):
    """Packed-layout program step: `n_sub` heads per program, side by side in
    the lane dimension (Mosaic requires 128-divisible block widths, so a
    single d=64 head can't be a block — a PAIR can). The static Python loop
    over sub-heads reuses the streamed K/V block for every head in it,
    dividing K/V HBM traffic by `n_sub` relative to one-head-per-program."""
    if with_lse:
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
        lse_ref = None
    q_blk = pl.program_id(1)
    k_blk = pl.program_id(2)

    @pl.when(k_blk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # sequence masks are shared across the sub-heads
    shape = (block_q, block_k)
    col = k_blk * block_k + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    mask = col < kv_len
    if is_causal:
        row = q_blk * block_q + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        mask = jnp.logical_and(mask, col <= row + (kv_len - q_len))

    for t in range(n_sub):
        q = q_ref[0][:, t * d : (t + 1) * d]
        k = k_ref[0][:, t * d : (t + 1) * d]
        v = v_ref[0][:, t * d : (t + 1) * d]
        s = (
            jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            * scale
        )
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_ref[:, t * _LANE : t * _LANE + 1]
        l_prev = l_ref[:, t * _LANE : t * _LANE + 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:, t * d : (t + 1) * d] = acc_ref[:, t * d : (t + 1) * d] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_ref[:, t * _LANE : (t + 1) * _LANE] = jnp.broadcast_to(m_new, (block_q, _LANE))
        l_ref[:, t * _LANE : (t + 1) * _LANE] = jnp.broadcast_to(l_new, (block_q, _LANE))

    @pl.when(k_blk == num_k_blocks - 1)
    def _finish():
        for t in range(n_sub):
            l_final = l_ref[:, t * _LANE : t * _LANE + 1]
            o_ref[0, :, t * d : (t + 1) * d] = (acc_ref[:, t * d : (t + 1) * d] / l_final).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[t] = (
                    m_ref[:, t * _LANE : (t + 1) * _LANE]
                    + jnp.log(l_ref[:, t * _LANE : (t + 1) * _LANE])
                ).astype(jnp.float32)


def _packed_n_sub(d: int) -> int:
    """Sub-heads per program: smallest n with n·d a lane-width multiple.

    REFINERS_TPU_FLASH_NSUB_MULT multiplies the grouping for program-level
    A/B (more heads per program amortize the K/V stream at short sequences —
    the seq-1024 sites run at ~52% MXU vs 67% at seq 4096); callers fall back
    to the flat path when the result doesn't divide the head count."""
    base = _LANE // math.gcd(d, _LANE)
    return base * _NSUB_MULT


def _flash_forward_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    is_causal: bool,
    scale: float | None,
    head_dim: int,
    with_lse: bool = True,
) -> tuple[jax.Array, ...]:
    """Flash forward over (B, Lq, H·D)/(B, Lk, H·D); returns (out[, lse]).

    Falls back to the flat (split-heads) forward when the sub-head grouping
    doesn't divide the local head count (e.g. odd per-device heads under TP)."""
    b, lq, hd = q.shape
    assert hd % head_dim == 0, (hd, head_dim)
    h = hd // head_dim
    d = head_dim
    lk = k.shape[1]
    n_sub = _packed_n_sub(d)
    if h % n_sub:
        def split(x):
            bb, ll, _ = x.shape
            return x.reshape(bb, ll, h, d).transpose(0, 2, 1, 3)

        res = _flash_forward(split(q), split(k), split(v), None, is_causal, scale, with_lse=with_lse)
        out = res[0].transpose(0, 2, 1, 3).reshape(b, lq, hd)
        if not with_lse:
            return (out,)
        lse = res[1]
        return out, lse.reshape(b * h, lse.shape[2], _LANE)

    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    block_q = min(_BLOCK_Q, _round_up(lq, _LANE))
    block_k = min(_BLOCK_K, _round_up(lk, _LANE))
    # VMEM guard (same as the flat path): the K/V stream is double-buffered
    # at (block_k, n_sub·d) tiles — cap block_k·width at the tuned width-128
    # budget, or the VAE's single-head d=512 sites overflow the 16 MB
    # scoped-VMEM stack (measured at batch 4, seq 16384: 16.07 MB needed).
    if n_sub * d > _LANE:
        block_k = min(block_k, _vmem_cap(_BLOCK_K, n_sub * d))
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)
    if lq_pad != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        k = jnp.pad(k, ((0, 0), (0, lk_pad - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_pad - lk), (0, 0)))

    hb = h // n_sub  # head-group blocks per batch row
    w = n_sub * d  # lane width of one head-group block (a _LANE multiple)
    num_k_blocks = lk_pad // block_k
    grid = (b * hb, lq_pad // block_q, num_k_blocks)
    kernel = functools.partial(
        _flash_kernel_packed,
        scale=scale,
        block_k=block_k,
        kv_len=lk,
        q_len=lq,
        block_q=block_q,
        num_k_blocks=num_k_blocks,
        is_causal=is_causal,
        with_lse=with_lse,
        d=d,
        n_sub=n_sub,
    )
    # block index (i % hb) along the feature dim selects the head group's
    # lane window; (i // hb) the batch row — a strided DMA, no transpose
    q_spec = pl.BlockSpec((1, block_q, w), lambda i, j, n, hb=hb: (i // hb, j, i % hb), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, w), lambda i, j, n, hb=hb: (i // hb, n, i % hb), memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((1, block_q, w), lambda i, j, n, hb=hb: (i // hb, j, i % hb), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, lq_pad, hd), q.dtype)]
    if with_lse:
        # program i covers global head rows [i·n_sub, (i+1)·n_sub): dim-0
        # block of size n_sub at block index i
        out_specs.append(
            pl.BlockSpec((n_sub, block_q, _LANE), lambda i, j, n: (i, j, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((b * h, lq_pad, _LANE), jnp.float32))

    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((block_q, n_sub * _LANE), jnp.float32),  # running max, per sub-head
            pltpu.VMEM((block_q, n_sub * _LANE), jnp.float32),  # running sum, per sub-head
            pltpu.VMEM((block_q, w), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * lk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=_interpret(),
    )(q, k, v)
    out = results[0][:, :lq]
    if not with_lse:
        return (out,)
    return out, results[1]


def _flash_backward_packed(
    q: jax.Array, k: jax.Array, v: jax.Array, o: jax.Array, lse: jax.Array, g: jax.Array,
    is_causal: bool, scale: float | None, head_dim: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Packed-layout backward: split to the flat (B, H, L, D) view and reuse
    the flat FA-2 kernels. The split/merge transposes this reintroduces cost
    only on the TRAINING path — the packed layout's win is the inference
    primal, which never runs this."""
    b, lq, hd = q.shape
    h = hd // head_dim
    lk = k.shape[1]

    def split(x: jax.Array, length: int) -> jax.Array:
        return x.reshape(b, length, h, head_dim).transpose(0, 2, 1, 3)

    lse4 = lse.reshape(b, h, lse.shape[1], _LANE)
    dq, dk, dv = _flash_backward(
        split(q, lq), split(k, lk), split(v, lk), split(o, lq), lse4, split(g, lq),
        is_causal, scale,
    )

    def merge(x: jax.Array, length: int) -> jax.Array:
        return x.transpose(0, 2, 1, 3).reshape(b, length, hd)

    return merge(dq, lq), merge(dk, lk), merge(dv, lk)


# ---------------------------------------------------------------------------
# mesh partitioning (GSPMD / Shardy) for the kernel calls
# ---------------------------------------------------------------------------
#
# A bare `pallas_call` has no SPMD partitioning rule: inside a sharded jit,
# GSPMD would replicate its operands (an all-gather per attention layer,
# destroying the TP win) or fail to propagate. These wrappers register the
# flash ops as custom-partitioned over the (batch, heads) dims — exactly the
# grid's embarrassingly-parallel axes — so DP shards batch and megatron-style
# TP shards heads with ZERO communication inside attention; sequence and
# head_dim are forced replicated (the online-softmax K/V stream is sequential
# per head). The Shardy `sharding_rule` handles propagation; the GSPMD
# `infer_sharding_from_operands` covers the non-Shardy path.


def _bh_axes(arg_shapes, mesh=None) -> tuple:
    """(batch, heads) mesh axes taken from the q operand's sharding.

    With `mesh`, the heads axis is dropped (replicated) when its mesh size
    doesn't divide the head count — an uneven heads shard would make GSPMD
    pad the axis and the kernel attend over garbage heads."""
    spec = arg_shapes[0].sharding.spec
    b = spec[0] if len(spec) > 0 else None
    h = spec[1] if len(spec) > 1 else None
    if h is not None and mesh is not None:
        heads = arg_shapes[0].shape[1]
        axes = h if isinstance(h, tuple) else (h,)
        size = math.prod(mesh.shape[a] for a in axes)
        if heads % size:
            h = None
    return b, h


@functools.lru_cache(maxsize=None)
def _partitioned_forward(is_causal: bool, scale: float | None, has_bias: bool, with_lse: bool = True):
    """(q, k, v[, bias]) → (out, lse) — or (out,) without lse — partitionable
    over batch/heads."""

    def impl(*args):
        q, k, v = args[:3]
        bias = args[3] if has_bias else None
        return _flash_forward(q, k, v, bias, is_causal, scale, with_lse=with_lse)

    op = custom_partitioning(impl)
    n_out = 2 if with_lse else 1

    def infer(mesh, arg_shapes, result_shape):
        b, h = _bh_axes(arg_shapes, mesh)
        s = NamedSharding(mesh, P(b, h, None, None))
        return tuple(s for _ in range(n_out))

    def partition(mesh, arg_shapes, result_shape):
        b, h = _bh_axes(arg_shapes, mesh)
        s = NamedSharding(mesh, P(b, h, None, None))
        return mesh, impl, tuple(s for _ in range(n_out)), tuple(s for _ in arg_shapes)

    rule = "b h q d, b h k d, b h k d{} -> b h q d{}".format(
        ", b h q k" if has_bias else "",
        ", b h p e" if with_lse else "",
    )
    op.def_partition(infer_sharding_from_operands=infer, partition=partition, sharding_rule=rule)
    return op


def _packed_axes(arg_shapes, mesh=None, head_dim: int | None = None) -> tuple:
    """(batch, feature) mesh axes from the packed q operand's sharding.

    When `mesh`/`head_dim` are given, the feature axis is DROPPED (replicated)
    if its mesh size doesn't divide the head count — a feature-dim shard must
    hold whole heads, and e.g. a 1-head d=64 site under 2-way TP would
    otherwise slice a single head in half (GSPMD then inserts the all-gather
    before the op instead)."""
    spec = arg_shapes[0].sharding.spec
    b = spec[0] if len(spec) > 0 else None
    f = spec[2] if len(spec) > 2 else None
    if f is not None and mesh is not None and head_dim is not None:
        heads = arg_shapes[0].shape[2] // head_dim
        axes = f if isinstance(f, tuple) else (f,)
        size = math.prod(mesh.shape[a] for a in axes)
        if heads % size:
            f = None
    return b, f


@functools.lru_cache(maxsize=None)
def _partitioned_forward_packed(is_causal: bool, scale: float | None, head_dim: int, with_lse: bool):
    """(q, k, v) packed (B, L, H·D) → (out[, lse]); batch shards over the
    batch axis, heads over the FEATURE axis (megatron TP's natural output
    sharding of the QKV projections — whole heads per device)."""

    def impl(q, k, v):
        return _flash_forward_packed(q, k, v, is_causal, scale, head_dim, with_lse=with_lse)

    op = custom_partitioning(impl)
    n_out = 2 if with_lse else 1

    def infer(mesh, arg_shapes, result_shape):
        b, f = _packed_axes(arg_shapes, mesh, head_dim)
        out = [NamedSharding(mesh, P(b, None, f))]
        if with_lse:
            out.append(NamedSharding(mesh, P(b, None, None)))  # lse: (B·H, Lq, LANE)
        return tuple(out)

    def partition(mesh, arg_shapes, result_shape):
        b, f = _packed_axes(arg_shapes, mesh, head_dim)
        s = NamedSharding(mesh, P(b, None, f))
        outs = [s]
        if with_lse:
            # lse's leading dim is B·H: the heads factor of a feature-axis
            # shard lands in the leading dim — shard it over both axes
            if b is not None and f is not None:
                outs.append(NamedSharding(mesh, P((b, f), None, None)))
            elif f is not None:
                outs.append(NamedSharding(mesh, P(f, None, None)))
            else:
                outs.append(NamedSharding(mesh, P(b, None, None)))
        return mesh, impl, tuple(outs), (s, s, s)

    rule = "b q hd, b k hd, b k hd -> b q hd{}".format(", bh p e" if with_lse else "")
    op.def_partition(infer_sharding_from_operands=infer, partition=partition, sharding_rule=rule)
    return op


@functools.lru_cache(maxsize=None)
def _partitioned_backward_packed(is_causal: bool, scale: float | None, head_dim: int):
    """Packed (q, k, v, o, lse, g) → (dq, dk, dv) over batch/feature axes."""

    def impl(q, k, v, o, lse, g):
        return _flash_backward_packed(q, k, v, o, lse, g, is_causal, scale, head_dim)

    op = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        b, f = _packed_axes(arg_shapes, mesh, head_dim)
        s = NamedSharding(mesh, P(b, None, f))
        return (s, s, s)

    def partition(mesh, arg_shapes, result_shape):
        b, f = _packed_axes(arg_shapes, mesh, head_dim)
        s = NamedSharding(mesh, P(b, None, f))
        if b is not None and f is not None:
            lse_s = NamedSharding(mesh, P((b, f), None, None))
        elif f is not None:
            lse_s = NamedSharding(mesh, P(f, None, None))
        else:
            lse_s = NamedSharding(mesh, P(b, None, None))
        return mesh, impl, (s, s, s), (s, s, s, s, lse_s, s)

    op.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b q hd, b k hd, b k hd, b q hd, bh p e, b q hd -> b q hd, b k hd, b k hd",
    )
    return op


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    is_causal: bool = False,
    scale: float | None = None,
    head_dim: int = 64,
) -> jax.Array:
    """Flash attention over PACKED (B, L, H·D) operands — the multi-head
    projection layout — with heads sliced by the kernel's BlockSpec index
    maps instead of a split-heads transpose. Semantically identical to
    `flash_attention` on the split view; saves the per-call head split/merge
    data formatting and consumes megatron TP's feature-dim sharding natively.
    No bias/mask support — masked callers route through `flash_attention`.
    """
    res = _run_forward_packed(q, k, v, is_causal, scale, head_dim, with_lse=_PRIMAL_LSE)
    return res[0]


def _run_forward_packed(q, k, v, is_causal, scale, head_dim, with_lse=True):
    return _partitioned_forward_packed(is_causal, scale, head_dim, with_lse)(q, k, v)


def _fwd_packed(q, k, v, is_causal, scale, head_dim):
    out, lse = _run_forward_packed(q, k, v, is_causal, scale, head_dim)
    return out, (q, k, v, out, lse)


def _bwd_packed(is_causal, scale, head_dim, res, g):
    q, k, v, out, lse = res
    return _partitioned_backward_packed(is_causal, scale, head_dim)(q, k, v, out, lse, g)


flash_attention_packed.defvjp(_fwd_packed, _bwd_packed)


@functools.lru_cache(maxsize=None)
def _partitioned_backward(is_causal: bool, scale: float | None):
    """(q, k, v, o, lse, g) → (dq, dk, dv), partitionable over batch/heads."""

    def impl(q, k, v, o, lse, g):
        return _flash_backward(q, k, v, o, lse, g, is_causal, scale)

    op = custom_partitioning(impl)

    def infer(mesh, arg_shapes, result_shape):
        b, h = _bh_axes(arg_shapes, mesh)
        s = NamedSharding(mesh, P(b, h, None, None))
        return (s, s, s)

    def partition(mesh, arg_shapes, result_shape):
        b, h = _bh_axes(arg_shapes, mesh)
        s = NamedSharding(mesh, P(b, h, None, None))
        return mesh, impl, (s, s, s), tuple(s for _ in arg_shapes)

    op.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b h q d, b h k d, b h k d, b h q d, b h p e, b h q d -> b h q d, b h k d, b h k d",
    )
    return op


# ---------------------------------------------------------------------------
# public entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    is_causal: bool = False,
    scale: float | None = None,
) -> jax.Array:
    """Flash attention over (B, H, L, D); bf16-friendly, O(L) memory.

    `bias` is an optional additive logits bias broadcastable to
    (B, H, Lq, Lk), streamed through VMEM blockwise. Composes with
    `jax.sharding` meshes: the op partitions over batch ("data") and heads
    ("tensor") with no collectives inside attention.
    """
    # the primal skips the logsumexp residual (with_lse=False): under jit
    # without differentiation this kernel variant avoids its HBM writes;
    # under jax.grad the custom_vjp routes through `_fwd` instead.
    # (_PRIMAL_LSE re-enables the residual for program-level A/B.)
    res = _run_forward(q, k, v, bias, is_causal, scale, with_lse=_PRIMAL_LSE)
    return res[0]


def _run_forward(q, k, v, bias, is_causal, scale, with_lse=True):
    b, h, lq, _ = q.shape
    lk = k.shape[2]
    if bias is None:
        return _partitioned_forward(is_causal, scale, False, with_lse)(q, k, v)
    bias = jnp.broadcast_to(bias, (b, h, lq, lk))
    return _partitioned_forward(is_causal, scale, True, with_lse)(q, k, v, bias)


def _fwd(q, k, v, bias, is_causal, scale):
    out, lse = _run_forward(q, k, v, bias, is_causal, scale)
    return out, (q, k, v, bias, out, lse)


def _bwd(is_causal, scale, res, g):
    q, k, v, bias, out, lse = res
    if bias is None:
        dq, dk, dv = _partitioned_backward(is_causal, scale)(q, k, v, out, lse, g)
        return dq, dk, dv, None
    # bias path: the bias gradient needs the full P matrix — recompute via XLA
    from refiners_tpu.ops.attention import _xla_attention

    def ref(q, k, v, bias):
        return _xla_attention(q, k, v, mask=bias, is_causal=is_causal, scale=scale)

    _, vjp = jax.vjp(ref, q, k, v, bias)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
