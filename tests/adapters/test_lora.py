"""LoRA tests, mirroring /root/reference/tests/adapters/test_lora.py semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.adapters import Conv2dLora, LinearLora, Lora, LoraAdapter, auto_attach_loras


@pytest.fixture
def lora() -> LinearLora:
    return LinearLora("test", in_features=320, out_features=128, rank=16)


@pytest.fixture
def conv_lora() -> Conv2dLora:
    return Conv2dLora("conv_test", in_channels=16, out_channels=8, rank=4)


def test_properties(lora: LinearLora) -> None:
    assert lora.name == "test"
    assert lora.rank == 16
    assert lora.scale == 1.0
    assert lora.in_features == lora.down.in_features == 320
    assert lora.out_features == lora.up.out_features == 128
    assert lora.down.weight.shape == (320, 16)
    assert lora.up.weight.shape == (16, 128)


def test_init_values(lora: LinearLora) -> None:
    # up starts at zero → LoRA is initially the identity delta
    assert float(jnp.abs(lora.up.weight).sum()) == 0.0
    assert float(jnp.abs(lora.down.weight).sum()) > 0.0
    x = jnp.ones((1, 320))
    assert float(jnp.abs(lora(x)).sum()) == 0.0


def test_scale_setter(lora: LinearLora) -> None:
    lora.scale = 2.0
    assert lora.scale == 2.0
    assert lora.ensure_find(fl.Multiply).scale == 2.0


def test_from_weights_torch_layout() -> None:
    down = np.random.randn(16, 320).astype(np.float32)  # (rank, in)
    up = np.random.randn(128, 16).astype(np.float32)  # (out, rank)
    lora = Lora.from_weights("w", down=jnp.asarray(down), up=jnp.asarray(up))
    assert isinstance(lora, LinearLora)
    assert lora.rank == 16 and lora.in_features == 320 and lora.out_features == 128
    x = np.random.randn(2, 320).astype(np.float32)
    expected = x @ down.T @ up.T
    np.testing.assert_allclose(np.asarray(lora(jnp.asarray(x))), expected, atol=1e-4)


def test_from_dict() -> None:
    state_dict = {
        "a.down.weight": jnp.zeros((4, 8)),
        "a.up.weight": jnp.zeros((8, 4)),
        "b.down.weight": jnp.zeros((4, 16, 1, 1)),
        "b.up.weight": jnp.zeros((16, 4, 3, 3)),
    }
    loras = Lora.from_dict("test", state_dict)
    assert list(loras.keys()) == ["a", "b"]
    assert isinstance(loras["a"], LinearLora)
    assert isinstance(loras["b"], Conv2dLora)
    assert loras["b"].kernel_size == (1, 3)
    assert loras["b"].padding == (0, 1)


def test_lora_adapter_basic() -> None:
    target = fl.Linear(320, 128)
    chain = fl.Chain(fl.Chain(target))
    lora = LinearLora("test", 320, 128, rank=16)
    adapter = LoraAdapter(target, lora).inject(chain.Chain)

    assert adapter.names == ["test"]
    assert adapter.scales == {"test": 1.0}

    x = jnp.ones((1, 320))
    # zero-init up → output identical to base
    base = target(x)
    np.testing.assert_allclose(np.asarray(chain(x)), np.asarray(base), atol=1e-6)

    # with nonzero up the lora contributes
    lora.up.weight = jnp.ones_like(lora.up.weight)
    assert not np.allclose(np.asarray(chain(x)), np.asarray(base))

    # multi-lora add/remove
    lora2 = LinearLora("second", 320, 128, rank=8)
    adapter.add_lora(lora2)
    assert adapter.names == ["test", "second"]
    removed = adapter.remove_lora("second")
    assert removed is lora2
    assert adapter.names == ["test"]
    assert adapter.remove_lora("nope") is None

    adapter.eject()
    assert chain.Chain[0] is target


def test_lora_adapter_scale_dict_setter() -> None:
    target = fl.Linear(8, 8)
    adapter = LoraAdapter(target, LinearLora("a", 8, 8, rank=2), LinearLora("b", 8, 8, rank=2))
    adapter.scale = {"a": 0.5, "b": 2.0}
    assert adapter.scales == {"a": 0.5, "b": 2.0}


def test_auto_attach() -> None:
    model = fl.Chain(
        fl.Chain(fl.Linear(320, 128)),
        fl.Linear(128, 64),
    )
    lora = LinearLora("test", in_features=320, out_features=128, rank=16)
    attached = lora.auto_attach(model)
    assert attached is not None
    adapter, parent = attached
    assert parent is model.Chain
    adapter.inject(parent)
    assert isinstance(model.Chain[0], LoraAdapter)


def test_auto_attach_loras_sanity() -> None:
    model = fl.Chain(fl.Chain(fl.Linear(16, 16)), fl.Linear(16, 8))
    loras = {
        "l1": LinearLora("n1", 16, 16, rank=4),
        "l2": LinearLora("n2", 16, 8, rank=4),
    }
    failed = auto_attach_loras(loras, model, sanity_check=True)
    assert failed == []
    assert isinstance(model.Chain[0], LoraAdapter)
    assert isinstance(model[1], LoraAdapter)


def test_auto_attach_loras_failure() -> None:
    model = fl.Chain(fl.Linear(16, 16))
    loras = {"l1": LinearLora("n1", 999, 999, rank=4)}
    failed = auto_attach_loras(loras, model, sanity_check=False)
    assert failed == ["l1"]


def test_conv_lora_forward(conv_lora: Conv2dLora) -> None:
    x = jnp.ones((1, 8, 8, 16))
    out = conv_lora(x)
    assert out.shape == (1, 8, 8, 8)
    assert float(jnp.abs(out).sum()) == 0.0  # zero-init up


def test_conv_lora_adapter_in_jit() -> None:
    target = fl.Conv2d(16, 8, 3, padding=1)
    chain = fl.Chain(target)
    lora = Conv2dLora("c", in_channels=16, out_channels=8, rank=4)
    lora.up.weight = jnp.ones_like(lora.up.weight) * 0.01
    LoraAdapter(target, lora).inject(chain)
    x = jnp.ones((1, 8, 8, 16))
    eager = chain(x)
    jitted = jax.jit(lambda m, v: m(v))(chain, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)


def test_lora_adapter_grad_only_lora() -> None:
    """Training masks: gradients flow through lora weights inside the adapter."""
    target = fl.Linear(8, 8)
    lora = LinearLora("t", 8, 8, rank=2)
    lora.up.weight = jnp.ones_like(lora.up.weight)
    chain = fl.Chain(target)
    LoraAdapter(target, lora).inject(chain)
    x = jnp.ones((2, 8))

    def loss(m: fl.Chain, v: jax.Array) -> jax.Array:
        return jnp.sum(m(v) ** 2)

    grads = jax.grad(loss)(chain, x)
    lora_grads = grads[0][1]  # LoraAdapter → Lora
    assert float(jnp.abs(lora_grads.down.weight).sum()) > 0
