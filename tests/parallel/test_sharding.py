"""Mesh sharding tests on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.parallel import (
    ATTENTION_TP_RULES,
    data_sharding,
    make_mesh,
    replicate_module,
    shard_module,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _toy_transformer() -> fl.Chain:
    from refiners_tpu.foundationals.clip.common import FeedForward

    return fl.Chain(
        fl.Residual(fl.LayerNorm(64), fl.SelfAttention(embedding_dim=64, num_heads=4)),
        fl.Residual(fl.LayerNorm(64), FeedForward(embedding_dim=64, feedforward_dim=128)),
    )


def test_mesh_shapes() -> None:
    mesh = make_mesh(tensor=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "tensor")


def test_tensor_parallel_matches_single_device() -> None:
    model = _toy_transformer()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 10, 64).astype(np.float32))
    expected = model(x)

    mesh = make_mesh(data=4, tensor=2)
    shard_module(model, mesh, ATTENTION_TP_RULES)
    xs = jax.device_put(x, data_sharding(mesh, x.ndim))

    out = jax.jit(lambda m, v: m(v))(model, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)
    # params kept their sharding: qkv Linear weights split on the out axis
    qkv = model.layer([0, 1]).layer("Distribute")[0].weight
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "tensor")


def test_data_parallel_grad_matches_single_device() -> None:
    model = _toy_transformer()
    x = jnp.asarray(np.random.RandomState(1).randn(8, 6, 64).astype(np.float32))

    def loss(m: fl.Chain, v: jax.Array) -> jax.Array:
        return jnp.mean(m(v) ** 2)

    g_single = jax.grad(loss)(model, x)

    mesh = make_mesh(data=8, tensor=1)
    replicate_module(model, mesh)
    xs = jax.device_put(x, data_sharding(mesh, x.ndim))
    g_sharded = jax.jit(jax.grad(loss))(model, xs)

    w1 = g_single[0][1].layer("Distribute")[0].weight
    w2 = g_sharded[0][1].layer("Distribute")[0].weight
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)
