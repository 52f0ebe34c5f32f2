"""Fused GroupNorm+SiLU Pallas kernel and the chain-surgery pass.

Reference anchor: the GN→SiLU→Conv pattern it accelerates is
/root/reference/src/refiners/foundationals/latent_diffusion/unet.py:6-52.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion import manual_seed
from refiners_tpu.fluxion.optimization import (
    FusedGroupNormSiLU,
    fuse_group_norm_silu,
    unfuse_group_norm_silu,
)
from refiners_tpu.ops.group_norm import _xla_reference, group_norm_silu


@pytest.mark.parametrize(
    "shape,groups",
    [
        ((2, 16, 16, 320), 32),  # SD top level: C/G=10, C not lane-aligned
        ((1, 8, 8, 1280), 32),  # SDXL bottom level
        ((1, 7, 9, 64), 8),  # odd spatial, small C
    ],
)
def test_group_norm_silu_matches_xla(shape: tuple, groups: int) -> None:
    key = jax.random.key(0)
    kx, kw, kb = jax.random.split(key, 3)
    c = shape[-1]
    x = jax.random.normal(kx, shape) * 2.0 + 0.5
    w = jax.random.normal(kw, (c,)) * 0.2 + 1.0
    b = jax.random.normal(kb, (c,)) * 0.1

    with pltpu.force_tpu_interpret_mode():
        got = group_norm_silu(x, w, b, groups)
    expected = _xla_reference(x, w, b, groups, 1e-5, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_group_norm_silu_matches_layer_pair() -> None:
    """Kernel output == fl.GroupNorm followed by fl.SiLU."""
    manual_seed(3)
    gn = fl.GroupNorm(channels=96, num_groups=32)
    gn.weight = jax.random.normal(jax.random.key(1), (96,)) * 0.3 + 1.0
    gn.bias = jax.random.normal(jax.random.key(2), (96,)) * 0.2
    x = jax.random.normal(jax.random.key(3), (2, 5, 6, 96))

    expected = fl.SiLU()(gn(x))
    with pltpu.force_tpu_interpret_mode():
        got = group_norm_silu(x, gn.weight, gn.bias, 32, gn.eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_group_norm_silu_bf16() -> None:
    x = (jax.random.normal(jax.random.key(4), (1, 16, 16, 128)) * 3).astype(jnp.bfloat16)
    w = jnp.ones((128,), jnp.bfloat16)
    b = jnp.zeros((128,), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = group_norm_silu(x, w, b, 32)
    expected = _xla_reference(x, w, b, 32, 1e-5, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected, np.float32), atol=2e-2
    )


def test_group_norm_silu_gradients_match_xla() -> None:
    kx, kw, kb = jax.random.split(jax.random.key(5), 3)
    x = jax.random.normal(kx, (1, 4, 4, 32))
    w = jax.random.normal(kw, (32,)) * 0.1 + 1.0
    b = jax.random.normal(kb, (32,)) * 0.1

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(lambda *a: jnp.sum(jnp.sin(group_norm_silu(*a, 8))), argnums=(0, 1, 2))(x, w, b)
    expected = jax.grad(lambda *a: jnp.sum(jnp.sin(_xla_reference(*a, 8, 1e-5, True))), argnums=(0, 1, 2))(x, w, b)
    for g, e, name in zip(got, expected, ("x", "w", "b")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=1e-4, err_msg=f"d{name}")


def _mini_residual_chain() -> fl.Chain:
    manual_seed(7)
    return fl.Chain(
        fl.GroupNorm(channels=32, num_groups=8),
        fl.SiLU(),
        fl.Conv2d(in_channels=32, out_channels=32, kernel_size=3, padding=1),
        fl.GroupNorm(channels=32, num_groups=8),
        fl.SiLU(),
        fl.Conv2d(in_channels=32, out_channels=32, kernel_size=3, padding=1),
        fl.GroupNorm(channels=32, num_groups=8),  # trailing GN w/o SiLU: must NOT fuse
    )


def test_fuse_pass_rewrites_pairs_and_preserves_numerics() -> None:
    chain = _mini_residual_chain()
    x = jax.random.normal(jax.random.key(8), (1, 6, 6, 32))
    expected = chain(x)

    n = fuse_group_norm_silu(chain)
    assert n == 2
    assert len(list(chain.layers(FusedGroupNormSiLU))) == 2
    assert len(list(chain.layers(fl.SiLU))) == 0
    assert len(list(chain.layers(fl.GroupNorm))) == 1  # the unpaired one survives

    with pltpu.force_tpu_interpret_mode():
        got = chain(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_unfuse_restores_structure_and_weights() -> None:
    chain = _mini_residual_chain()
    before_repr = repr(chain)
    before_sd = {k: np.asarray(v) for k, v in chain.state_dict().items()}

    fuse_group_norm_silu(chain)
    n = unfuse_group_norm_silu(chain)
    assert n == 2
    assert repr(chain) == before_repr
    after_sd = chain.state_dict()
    assert before_sd.keys() == after_sd.keys()
    for k in before_sd:
        np.testing.assert_array_equal(before_sd[k], np.asarray(after_sd[k]))


def test_fuse_pass_on_sd1_unet_block() -> None:
    """The pass finds real ResidualBlock pairs in an actual UNet subtree."""
    from refiners_tpu.foundationals.latent_diffusion.unet import ResidualBlock

    manual_seed(9)
    block = ResidualBlock(in_channels=32, out_channels=64, num_groups=8)
    x = jax.random.normal(jax.random.key(10), (1, 8, 8, 32))
    expected = block(x)

    assert fuse_group_norm_silu(block) == 2
    with pltpu.force_tpu_interpret_mode():
        got = block(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)
