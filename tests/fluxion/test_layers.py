"""Numeric parity of NHWC layers vs torch CPU reference implementations.

The reference relies on torch.nn directly; we verify our channels-last JAX
layers reproduce torch semantics within float32 tolerances.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

import refiners_tpu.fluxion.layers as fl

ATOL = 1e-5


def to_nhwc(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.permute(0, 2, 3, 1).numpy())


def from_nhwc(x: jnp.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


def test_linear_matches_torch() -> None:
    tl = torch.nn.Linear(8, 16)
    ours = fl.Linear(8, 16)
    ours.load_state_dict(
        {"weight": jnp.asarray(tl.weight.detach().numpy().T), "bias": jnp.asarray(tl.bias.detach().numpy())}
    )
    x = torch.randn(4, 8)
    expected = tl(x).detach().numpy()
    got = np.asarray(ours(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, expected, atol=ATOL)


@pytest.mark.parametrize("stride,padding,groups", [(1, 1, 1), (2, 1, 1), (1, 0, 1), (1, 1, 4)])
def test_conv2d_matches_torch(stride: int, padding: int, groups: int) -> None:
    tc = torch.nn.Conv2d(8, 16, 3, stride=stride, padding=padding, groups=groups)
    ours = fl.Conv2d(8, 16, 3, stride=stride, padding=padding, groups=groups)
    # torch OIHW → our HWIO
    w = tc.weight.detach().numpy().transpose(2, 3, 1, 0)
    ours.load_state_dict({"weight": jnp.asarray(w), "bias": jnp.asarray(tc.bias.detach().numpy())})
    x = torch.randn(2, 8, 10, 10)
    expected = tc(x).detach()
    got = ours(to_nhwc(x))
    np.testing.assert_allclose(np.asarray(from_nhwc(got)), expected.numpy(), atol=1e-4)


@pytest.mark.parametrize("stride,padding,kernel", [(2, 0, 2), (2, 1, 4), (1, 1, 3)])
def test_conv_transpose2d_matches_torch(stride: int, padding: int, kernel: int) -> None:
    tc = torch.nn.ConvTranspose2d(8, 4, kernel, stride=stride, padding=padding)
    ours = fl.ConvTranspose2d(8, 4, kernel, stride=stride, padding=padding)
    # torch (in, out, kh, kw) → our (kh, kw, in, out)
    w = tc.weight.detach().numpy().transpose(2, 3, 0, 1)
    ours.load_state_dict({"weight": jnp.asarray(w), "bias": jnp.asarray(tc.bias.detach().numpy())})
    x = torch.randn(2, 8, 7, 7)
    expected = tc(x).detach()
    got = ours(to_nhwc(x))
    np.testing.assert_allclose(np.asarray(from_nhwc(got)), expected.numpy(), atol=1e-4)


def test_group_norm_matches_torch() -> None:
    tn = torch.nn.GroupNorm(8, 32)
    with torch.no_grad():
        tn.weight.normal_()
        tn.bias.normal_()
    ours = fl.GroupNorm(channels=32, num_groups=8)
    ours.load_state_dict(
        {"weight": jnp.asarray(tn.weight.detach().numpy()), "bias": jnp.asarray(tn.bias.detach().numpy())}
    )
    x = torch.randn(2, 32, 6, 6)
    expected = tn(x).detach()
    got = ours(to_nhwc(x))
    np.testing.assert_allclose(np.asarray(from_nhwc(got)), expected.numpy(), atol=1e-5)


def test_layer_norm_matches_torch() -> None:
    tn = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tn.weight.normal_()
        tn.bias.normal_()
    ours = fl.LayerNorm(16)
    ours.load_state_dict(
        {"weight": jnp.asarray(tn.weight.detach().numpy()), "bias": jnp.asarray(tn.bias.detach().numpy())}
    )
    x = torch.randn(2, 7, 16)
    np.testing.assert_allclose(
        np.asarray(ours(jnp.asarray(x.numpy()))), tn(x).detach().numpy(), atol=ATOL
    )


def test_layer_norm_2d_matches_torch() -> None:
    # reference LayerNorm2d normalizes over channel dim of NCHW
    c = 12
    weight = torch.randn(c)
    bias = torch.randn(c)
    x = torch.randn(2, c, 5, 5)
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    expected = (x - u) / torch.sqrt(s + 1e-6) * weight[None, :, None, None] + bias[None, :, None, None]
    ours = fl.LayerNorm2d(c)
    ours.load_state_dict({"weight": jnp.asarray(weight.numpy()), "bias": jnp.asarray(bias.numpy())})
    got = ours(to_nhwc(x))
    np.testing.assert_allclose(np.asarray(from_nhwc(got)), expected.numpy(), atol=1e-5)


def test_embedding_matches_torch() -> None:
    te = torch.nn.Embedding(10, 4)
    ours = fl.Embedding(10, 4)
    ours.load_state_dict({"weight": jnp.asarray(te.weight.detach().numpy())})
    ids = torch.tensor([[1, 2, 3], [7, 8, 9]])
    np.testing.assert_allclose(
        np.asarray(ours(jnp.asarray(ids.numpy()))), te(ids).detach().numpy(), atol=ATOL
    )


def test_attention_matches_torch_sdpa() -> None:
    q = torch.randn(2, 4, 16, 8)
    k = torch.randn(2, 4, 16, 8)
    v = torch.randn(2, 4, 16, 8)
    expected = torch.nn.functional.scaled_dot_product_attention(q, k, v).numpy()
    from refiners_tpu.ops import dot_product_attention

    got = dot_product_attention(jnp.asarray(q.numpy()), jnp.asarray(k.numpy()), jnp.asarray(v.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_causal_attention_matches_torch_sdpa() -> None:
    q = torch.randn(1, 2, 9, 8)
    k = torch.randn(1, 2, 9, 8)
    v = torch.randn(1, 2, 9, 8)
    expected = torch.nn.functional.scaled_dot_product_attention(q, k, v, is_causal=True).numpy()
    from refiners_tpu.ops import dot_product_attention

    got = dot_product_attention(
        jnp.asarray(q.numpy()), jnp.asarray(k.numpy()), jnp.asarray(v.numpy()), is_causal=True
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_sliced_xla_attention_exact(monkeypatch) -> None:
    """Auto query-slicing of the XLA path (the reference's sliced attention,
    attentions.py:135-155, made automatic) partitions softmax rows without
    touching their math — equal to the dense program up to XLA reassociating
    reductions across differently-shaped einsums (observed max 1 ULP)."""
    import jax

    import refiners_tpu.ops.attention as attn_mod
    from refiners_tpu.ops.attention import _xla_attention, _xla_attention_dense

    key = jax.random.key(5)
    kq, kk, kv = jax.random.split(key, 3)
    cases = [
        dict(lq=96, lk=96, is_causal=False, mask=None),
        dict(lq=96, lk=96, is_causal=True, mask=None),
        dict(lq=60, lk=96, is_causal=True, mask=None),  # uneven chunks + offset
        dict(lq=96, lk=96, is_causal=False, mask="bool_lq"),
        dict(lq=96, lk=96, is_causal=False, mask="bias_broadcast"),
    ]
    for case in cases:
        lq, lk = case["lq"], case["lk"]
        q = jax.random.normal(kq, (2, 3, lq, 8))
        k = jax.random.normal(kk, (2, 3, lk, 8))
        v = jax.random.normal(kv, (2, 3, lk, 8))
        mask = None
        if case["mask"] == "bool_lq":
            mask = jax.random.bernoulli(kq, 0.8, (2, 1, lq, lk))
        elif case["mask"] == "bias_broadcast":
            mask = jax.random.normal(kv, (1, 1, 1, lk))
        offset = jnp.asarray(lk - lq) if case["is_causal"] else None
        dense = _xla_attention_dense(q, k, v, mask, offset, 8**-0.5)
        monkeypatch.setattr(attn_mod, "_XLA_SLICE_BYTES", 2 * 3 * 16 * lk * 4)  # force ~6 chunks
        sliced = _xla_attention(q, k, v, mask=mask, is_causal=case["is_causal"])
        monkeypatch.undo()
        np.testing.assert_allclose(np.asarray(sliced), np.asarray(dense), atol=1e-6, err_msg=str(case))


def test_flash_attention_matches_xla() -> None:
    import jax

    from refiners_tpu.ops.attention import _xla_attention
    from refiners_tpu.ops.flash_attention import flash_attention

    key = jax.random.key(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 200, 64))
    k = jax.random.normal(kk, (1, 2, 200, 64))
    v = jax.random.normal(kv, (1, 2, 200, 64))
    # interpreter mode on CPU
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v)
    expected = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_flash_attention_causal_matches_xla() -> None:
    import jax

    from refiners_tpu.ops.attention import _xla_attention
    from refiners_tpu.ops.flash_attention import flash_attention

    key = jax.random.key(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 1, 130, 32))
    k = jax.random.normal(kk, (1, 1, 130, 32))
    v = jax.random.normal(kv, (1, 1, 130, 32))
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, is_causal=True)
    expected = _xla_attention(q, k, v, is_causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_flash_attention_bias_matches_xla() -> None:
    import jax

    from refiners_tpu.ops.attention import _xla_attention
    from refiners_tpu.ops.flash_attention import flash_attention

    key = jax.random.key(3)
    kq, kk, kv, kb = jax.random.split(key, 4)
    q = jax.random.normal(kq, (2, 2, 150, 32))
    k = jax.random.normal(kk, (2, 2, 150, 32))
    v = jax.random.normal(kv, (2, 2, 150, 32))
    bias = jax.random.normal(kb, (2, 2, 150, 150))
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, bias=bias)
    expected = _xla_attention(q, k, v, mask=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_flash_attention_pallas_backward_matches_xla_grads() -> None:
    import jax
    import jax.numpy as jnp_

    from refiners_tpu.ops.attention import _xla_attention
    from refiners_tpu.ops.flash_attention import flash_attention

    key = jax.random.key(4)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 180, 32))
    k = jax.random.normal(kk, (1, 2, 140, 32))
    v = jax.random.normal(kv, (1, 2, 140, 32))

    def loss_flash(q, k, v):
        return jnp_.sum(jnp_.sin(flash_attention(q, k, v)))

    def loss_xla(q, k, v):
        return jnp_.sum(jnp_.sin(_xla_attention(q, k, v)))

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    expected = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for g, e, name in zip(got, expected, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=1e-4, err_msg=f"d{name}")


def test_flash_attention_causal_backward_matches_xla_grads() -> None:
    import jax
    import jax.numpy as jnp_

    from refiners_tpu.ops.attention import _xla_attention
    from refiners_tpu.ops.flash_attention import flash_attention

    key = jax.random.key(5)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 1, 130, 32))
    k = jax.random.normal(kk, (1, 1, 130, 32))
    v = jax.random.normal(kv, (1, 1, 130, 32))

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(lambda *a: jnp_.sum(jnp_.tanh(flash_attention(*a, is_causal=True))), argnums=(0, 1, 2))(q, k, v)
    expected = jax.grad(lambda *a: jnp_.sum(jnp_.tanh(_xla_attention(*a, is_causal=True))), argnums=(0, 1, 2))(q, k, v)
    for g, e, name in zip(got, expected, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=1e-4, err_msg=f"d{name}")


def test_multihead_attention_matches_torch() -> None:
    torch.manual_seed(0)
    embed, heads = 32, 4
    tmha = torch.nn.MultiheadAttention(embed, heads, batch_first=True, bias=True)
    ours = fl.SelfAttention(embedding_dim=embed, num_heads=heads)
    wq, wk, wv = tmha.in_proj_weight.detach().chunk(3)
    bq, bk, bv = tmha.in_proj_bias.detach().chunk(3)
    d = ours.layer("Distribute")
    d[0].load_state_dict({"weight": jnp.asarray(wq.numpy().T), "bias": jnp.asarray(bq.numpy())})
    d[1].load_state_dict({"weight": jnp.asarray(wk.numpy().T), "bias": jnp.asarray(bk.numpy())})
    d[2].load_state_dict({"weight": jnp.asarray(wv.numpy().T), "bias": jnp.asarray(bv.numpy())})
    ours[-1].load_state_dict(
        {
            "weight": jnp.asarray(tmha.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(tmha.out_proj.bias.detach().numpy()),
        }
    )
    x = torch.randn(2, 7, embed)
    expected, _ = tmha(x, x, x)
    got = ours(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected.detach().numpy(), atol=1e-5)


def test_interpolate_bilinear_matches_torch() -> None:
    x = torch.randn(1, 3, 8, 8)
    expected = torch.nn.functional.interpolate(x, size=(16, 16), mode="bilinear", align_corners=False)
    from refiners_tpu.fluxion.utils import interpolate

    got = interpolate(to_nhwc(x), (16, 16), mode="bilinear")
    np.testing.assert_allclose(np.asarray(from_nhwc(got)), expected.numpy(), atol=1e-5)


def test_maxpool2d_matches_torch() -> None:
    x = torch.randn(1, 4, 9, 9)
    expected = torch.nn.functional.max_pool2d(x, 3, stride=2, padding=1)
    got = fl.MaxPool2d(3, stride=2, padding=1)(to_nhwc(x))
    np.testing.assert_allclose(np.asarray(from_nhwc(got)), expected.numpy(), atol=ATOL)


def test_pixel_unshuffle_matches_torch() -> None:
    x = torch.randn(1, 3, 8, 8)
    expected = torch.nn.functional.pixel_unshuffle(x, 2)
    got = fl.PixelUnshuffle(2)(to_nhwc(x))
    np.testing.assert_allclose(np.asarray(from_nhwc(got)), expected.numpy(), atol=ATOL)


def test_glu_gelu_silu_match_torch() -> None:
    x = torch.randn(2, 8)
    xj = jnp.asarray(x.numpy())
    np.testing.assert_allclose(np.asarray(fl.SiLU()(xj)), torch.nn.functional.silu(x).numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(fl.GeLU()(xj)), torch.nn.functional.gelu(x).numpy(), atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(fl.GeLU(fl.GeLUApproximation.TANH)(xj)),
        torch.nn.functional.gelu(x, approximate="tanh").numpy(),
        atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(fl.GLU(fl.GeLU())(xj)), torch.nn.functional.gelu(x[:, :4]).numpy() * 0 + (x[:, :4] * torch.nn.functional.gelu(x[:, 4:])).numpy(), atol=ATOL
    )


def test_gaussian_blur_matches_reference_shape() -> None:
    from refiners_tpu.fluxion.utils import gaussian_blur

    x = jnp.ones((1, 9, 9, 3))
    out = gaussian_blur(x, 5, 1.5)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.ones((1, 9, 9, 3)), atol=1e-5)


def test_converter_casts_dtype_from_parent() -> None:
    import jax.numpy as jnp

    import refiners_tpu.fluxion.layers as fl

    chain = fl.Chain(fl.Converter(set_dtype=True), fl.Linear(4, 4, dtype=jnp.bfloat16))
    x = jnp.ones((1, 4), dtype=jnp.float32)
    out = chain(x)
    assert out.dtype == jnp.bfloat16

    # integer inputs pass through uncast
    conv = chain.ensure_find(fl.Converter)
    casted = conv(jnp.ones((2,), jnp.int32), jnp.ones((2,), jnp.float32))
    assert casted[0].dtype == jnp.int32
    assert casted[1].dtype == jnp.bfloat16


def test_converter_noop_without_dtype() -> None:
    import jax.numpy as jnp

    import refiners_tpu.fluxion.layers as fl

    chain = fl.Chain(fl.Converter(set_dtype=False), fl.Linear(4, 4, dtype=jnp.bfloat16))
    x = jnp.ones((1, 4), dtype=jnp.float32)
    conv = chain.ensure_find(fl.Converter)
    assert conv(x)[0].dtype == jnp.float32
