"""QKV fusion pass: numerics preserved, reversible, adapters skipped."""

import jax.numpy as jnp
import numpy as np

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion import manual_seed
from refiners_tpu.fluxion.adapters.lora import LinearLora
from refiners_tpu.fluxion.optimization import (
    FusedQKVProjection,
    fuse_qkv_projections,
    unfuse_qkv_projections,
)


def _attn_chain() -> fl.Chain:
    manual_seed(0)
    return fl.Chain(
        fl.SelfAttention(embedding_dim=32, num_heads=4),
        fl.Linear(32, 8),
    )


def test_fuse_qkv_preserves_output_and_reverses() -> None:
    model = _attn_chain()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 32).astype(np.float32))
    base = np.asarray(model(x))

    assert fuse_qkv_projections(model) == 1
    fused_module = model.ensure_find(FusedQKVProjection)
    assert fused_module.out_features == 96
    np.testing.assert_allclose(np.asarray(model(x)), base, atol=1e-5)

    assert unfuse_qkv_projections(model) == 1
    assert model.find(FusedQKVProjection) is None
    np.testing.assert_allclose(np.asarray(model(x)), base, atol=0)  # exact weight round-trip


def test_fuse_qkv_skips_adapted_projections() -> None:
    model = _attn_chain()
    attn = model.ensure_find(fl.SelfAttention)
    q = attn.ensure_find(fl.Distribute)[0]
    lora = LinearLora("style", in_features=32, out_features=32, rank=2)
    attach = lora.auto_attach(attn)
    assert attach is not None
    adapter, parent = attach
    adapter.inject(parent)
    assert fuse_qkv_projections(model) == 0  # q is LoRA-wrapped → not plain Linear
