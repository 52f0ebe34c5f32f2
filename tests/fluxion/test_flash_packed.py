"""Packed-layout flash attention: (B, L, H·D) operands, heads sliced by the
kernel's BlockSpec index maps (no split/merge-heads transposes).

Covers the replacement for the reference's SDPA data path
(/root/reference/src/refiners/fluxion/layers/attentions.py:115): forward and
gradient parity vs the XLA path across head geometries (including the
sub-head grouping fallback), causal masking, ragged sequences, the
ScaledDotProductAttention layer integration, and the DP+TP mesh composition
(operands carrying the QKV projections' natural P(data, None, tensor)
sharding must flow through with zero collectives).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refiners_tpu.ops.attention import _xla_attention, force_flash, merge_heads, split_heads
from refiners_tpu.ops.flash_attention import _packed_n_sub, flash_attention_packed


def _ref(q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int, causal: bool = False) -> jax.Array:
    return merge_heads(
        _xla_attention(
            split_heads(q, num_heads), split_heads(k, num_heads), split_heads(v, num_heads), is_causal=causal
        )
    )


@pytest.mark.parametrize(
    "batch,lq,lk,heads,dim",
    [
        (2, 256, 320, 4, 64),  # n_sub=2 divides heads: native packed kernel
        (1, 256, 256, 5, 64),  # odd head count: split-heads fallback
        (1, 200, 300, 8, 40),  # SD1.5 geometry (n_sub=16 > heads): fallback
        (1, 256, 256, 3, 160),  # wide heads, odd count: fallback
    ],
)
def test_packed_forward_matches_xla(batch: int, lq: int, lk: int, heads: int, dim: int) -> None:
    q = jax.random.normal(jax.random.key(0), (batch, lq, heads * dim))
    k = jax.random.normal(jax.random.key(1), (batch, lk, heads * dim))
    v = jax.random.normal(jax.random.key(2), (batch, lk, heads * dim))
    got = jax.jit(lambda q, k, v: flash_attention_packed(q, k, v, head_dim=dim))(q, k, v)
    ref = _ref(q, k, v, heads)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-6, rel


def test_packed_gradients_match_xla() -> None:
    batch, lq, heads, dim = 2, 256, 4, 64
    q = jax.random.normal(jax.random.key(3), (batch, lq, heads * dim))
    k = jax.random.normal(jax.random.key(4), (batch, lq, heads * dim))
    v = jax.random.normal(jax.random.key(5), (batch, lq, heads * dim))
    g1 = jax.grad(lambda q, k, v: jnp.sum(flash_attention_packed(q, k, v, head_dim=dim) ** 2), argnums=(0, 1, 2))(
        q, k, v
    )
    g2 = jax.grad(lambda q, k, v: jnp.sum(_ref(q, k, v, heads) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
        assert rel < 5e-6, rel


def test_packed_causal() -> None:
    q = jax.random.normal(jax.random.key(6), (2, 256, 4 * 64))
    got = flash_attention_packed(q, q, q, is_causal=True, head_dim=64)
    ref = _ref(q, q, q, 4, causal=True)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-6, rel


def test_packed_sub_head_grouping() -> None:
    assert _packed_n_sub(64) == 2
    assert _packed_n_sub(128) == 1
    assert _packed_n_sub(40) == 16
    assert _packed_n_sub(160) == 4


def test_sdpa_layer_routes_flash_to_packed() -> None:
    """The layer's flash path must equal its XLA path (same weights, no
    transpose drift) — this is the integration the UNet hot loop runs."""
    import refiners_tpu.fluxion.layers as fl

    sdpa = fl.ScaledDotProductAttention(num_heads=4)
    q = jax.random.normal(jax.random.key(7), (2, 256, 256))
    k = jax.random.normal(jax.random.key(8), (2, 320, 256))
    v = jax.random.normal(jax.random.key(9), (2, 320, 256))
    with force_flash(False):
        ref = sdpa(q, k, v)
    with force_flash(True):
        got = sdpa(q, k, v)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-6, rel


def test_packed_sharded_dp_tp_no_collectives() -> None:
    """Packed flash under a (data, tensor) mesh: operands sharded
    P(data, None, tensor) — whole heads per device — must produce the
    single-device result exactly, without GSPMD inserting an all-gather."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh (conftest XLA_FLAGS)")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    batch, lq, heads, dim = 4, 256, 4, 64
    q = jax.random.normal(jax.random.key(10), (batch, lq, heads * dim))
    k = jax.random.normal(jax.random.key(11), (batch, lq, heads * dim))
    v = jax.random.normal(jax.random.key(12), (batch, lq, heads * dim))
    f = jax.jit(lambda q, k, v: flash_attention_packed(q, k, v, head_dim=dim))
    single = f(q, k, v)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "tensor"))
    s = NamedSharding(mesh, P("data", None, "tensor"))
    qs, ks, vs = jax.device_put(q, s), jax.device_put(k, s), jax.device_put(v, s)
    out = f(qs, ks, vs)
    assert out.sharding.spec == P("data", None, "tensor")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(single))
    assert "all-gather" not in f.lower(qs, ks, vs).compile().as_text()

    # gradient under the mesh (split-heads backward composition)
    gf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(flash_attention_packed(q, k, v, head_dim=dim) ** 2), argnums=(0, 1, 2)))
    for a, b in zip(gf(qs, ks, vs), gf(q, k, v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
