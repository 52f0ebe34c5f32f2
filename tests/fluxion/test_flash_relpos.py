"""Decomposed rel-pos flash kernel vs materialized-bias reference.

The kernel rebuilds bias[q, k] = v_rel[q, k//kw] + h_rel[q, k%kw] on-chip
(flash_attention.py: flash_attention_relpos); these tests pin it against the
O(L²)-materialized XLA computation in interpret mode, including the SAM-H
global-attention shape family and the fallback for non-dividing blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refiners_tpu.ops.flash_attention import flash_attention_relpos


def _reference(q, k, v, v_rel, h_rel, scale):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bias = v_rel[..., :, None].astype(jnp.float32) + h_rel[..., None, :].astype(jnp.float32)
    bias = bias.reshape(b, h, lq, lk)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    weights = jax.nn.softmax(logits + bias, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize(
    "kh,kw,heads,d",
    [
        (16, 16, 2, 64),  # lk = 256 — one tile cycle per row group
        (64, 64, 2, 80),  # the SAM-H global layer family (seq 4096, d 80)
        (14, 14, 3, 80),  # the SAM windowed family: lk = 196, padded single block
    ],
)
def test_relpos_kernel_matches_reference(kh: int, kw: int, heads: int, d: int) -> None:
    lq = lk = kh * kw
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(1, heads, lq, d).astype(np.float32))
    k = jnp.asarray(rs.randn(1, heads, lk, d).astype(np.float32))
    v = jnp.asarray(rs.randn(1, heads, lk, d).astype(np.float32))
    v_rel = jnp.asarray(0.5 * rs.randn(1, heads, lq, kh).astype(np.float32))
    h_rel = jnp.asarray(0.5 * rs.randn(1, heads, lq, kw).astype(np.float32))
    scale = d**-0.5

    got = flash_attention_relpos(q, k, v, v_rel, h_rel, scale=scale)
    expected = _reference(q, k, v, v_rel, h_rel, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_relpos_fallback_on_non_dividing_shapes() -> None:
    """kh·kw that doesn't divide the block size must route to the
    materialized-bias flash path, not miscompute."""
    kh, kw, heads, d = 10, 10, 1, 32  # lk = 100, not a lane multiple
    lq = lk = kh * kw
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(1, heads, lq, d).astype(np.float32))
    k = jnp.asarray(rs.randn(1, heads, lk, d).astype(np.float32))
    v = jnp.asarray(rs.randn(1, heads, lk, d).astype(np.float32))
    v_rel = jnp.asarray(rs.randn(1, heads, lq, kh).astype(np.float32))
    h_rel = jnp.asarray(rs.randn(1, heads, lq, kw).astype(np.float32))

    got = flash_attention_relpos(q, k, v, v_rel, h_rel)
    expected = _reference(q, k, v, v_rel, h_rel, d**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_sam_global_attention_flash_branch_matches_xla() -> None:
    """The encoder's flash branch (decomposed kernel) agrees with its own XLA
    fallback on a reduced SAM attention layer."""
    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.segment_anything.image_encoder import RelativePositionAttention
    from refiners_tpu.ops.attention import force_flash

    manual_seed(3)
    attn = RelativePositionAttention(embedding_dim=64, num_heads=4, spatial_size=(16, 16))
    # non-zero learned embeddings so the bias actually matters
    attn.horizontal_embedding = jnp.asarray(np.random.RandomState(4).randn(31, 16).astype(np.float32))
    attn.vertical_embedding = jnp.asarray(np.random.RandomState(5).randn(31, 16).astype(np.float32))
    x = jnp.asarray(np.random.RandomState(6).randn(1, 16, 16, 3 * 64).astype(np.float32))

    with force_flash(False):
        expected = attn(x)
    with force_flash(True):
        got = attn(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)
