"""Tensor-parallel sharding of real SD blocks on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refiners_tpu.parallel import ATTENTION_TP_RULES, data_sharding, make_mesh, shard_module

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_cross_attention_block_tp_matches_single_device() -> None:
    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.latent_diffusion.cross_attention import CrossAttentionBlock2d

    manual_seed(0)
    block = CrossAttentionBlock2d(
        channels=64,
        context_embedding_dim=96,
        context_key="clip_text_embedding",
        num_attention_heads=4,
        use_linear_projection=True,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 64).astype(np.float32))
    text = jnp.asarray(np.random.RandomState(1).randn(2, 7, 96).astype(np.float32))

    block.set_context("cross_attention_block", {"clip_text_embedding": text})
    expected = block(x)

    mesh = make_mesh(data=2, tensor=4)
    shard_module(block, mesh, ATTENTION_TP_RULES)
    xs = jax.device_put(x, data_sharding(mesh, x.ndim))

    def run(m, v, t):
        m.set_context("cross_attention_block", {"clip_text_embedding": t})
        return m(v)

    out = jax.jit(run)(block, xs, text)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    # the QKV projections are genuinely sharded on the tensor axis
    from refiners_tpu.foundationals.latent_diffusion.cross_attention import CrossAttentionBlock

    attn = block.ensure_find(CrossAttentionBlock)
    qkv = attn.layer(["Residual_1", "SelfAttention", "Distribute"])[0]
    assert qkv.weight.sharding.spec == jax.sharding.PartitionSpec(None, "tensor")
