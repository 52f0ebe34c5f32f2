"""Rematerialization wrapper: forward/grad equality and reversibility."""

import jax
import jax.numpy as jnp
import numpy as np

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion import manual_seed
from refiners_tpu.parallel.remat import Recompute, apply_remat, remove_remat


class Block(fl.Chain):
    pass


def _model() -> fl.Chain:
    manual_seed(0)
    return fl.Chain(
        fl.Linear(16, 32),
        Block(
            fl.Linear(32, 32),
            fl.SiLU(),
            fl.Residual(fl.Parallel(fl.Identity(), fl.UseContext("cond", "emb")), fl.Lambda(lambda a, b: a + b)),
        ),
        Block(fl.Linear(32, 32), fl.GeLU()),
        fl.Linear(32, 4),
    )


def test_remat_preserves_forward_and_grads() -> None:
    model = _model()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16).astype(np.float32))
    emb = jnp.asarray(np.random.RandomState(1).randn(2, 32).astype(np.float32))

    def loss(m, v, e):
        m.set_context("cond", {"emb": e})
        return jnp.sum(m(v) ** 2)

    base_loss, base_grads = jax.jit(jax.value_and_grad(loss))(model, x, emb)

    n = apply_remat(model, Block)
    assert n == 2
    assert sum(1 for _ in model.walk(Recompute, recurse=True)) == 2

    remat_loss, remat_grads = jax.jit(jax.value_and_grad(loss))(model, x, emb)
    np.testing.assert_allclose(float(remat_loss), float(base_loss), rtol=1e-6)

    base_leaves = jax.tree.leaves(base_grads)
    remat_leaves = jax.tree.leaves(remat_grads)
    assert len(base_leaves) == len(remat_leaves)
    for a, b in zip(base_leaves, remat_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # reversible
    assert remove_remat(model) == 2
    assert sum(1 for _ in model.walk(Recompute, recurse=True)) == 0
    after = jax.jit(jax.value_and_grad(loss))(model, x, emb)[0]
    np.testing.assert_allclose(float(after), float(base_loss), rtol=1e-6)
