"""Adapter inject/eject tests, mirroring /root/reference/tests/adapters/test_adapter.py."""

import jax.numpy as jnp
import pytest

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.adapters import Adapter


class DummyLinearAdapter(fl.Chain, Adapter[fl.Linear]):
    def __init__(self, target: fl.Linear):
        with self.setup_adapter(target):
            super().__init__(target)


class DummyChainAdapter(fl.Chain, Adapter[fl.Chain]):
    def __init__(self, target: fl.Chain):
        with self.setup_adapter(target):
            super().__init__(target)


@pytest.fixture
def chain() -> fl.Chain:
    return fl.Chain(fl.Chain(fl.Linear(2, 2)))


def test_weighted_module_adapter_insertion(chain: fl.Chain) -> None:
    parent = chain.Chain
    adaptee = parent.Linear

    adapter = DummyLinearAdapter(adaptee).inject(parent)

    assert adapter.parent == parent
    assert adapter in iter(parent)
    assert adaptee not in iter(parent)

    adapter.eject()
    assert adapter.parent is None
    assert adapter not in iter(parent)
    assert adaptee in iter(parent)


def test_chain_adapter_insertion(chain: fl.Chain) -> None:
    parent = chain
    adaptee = parent.Chain

    adapter = DummyChainAdapter(adaptee)
    assert adaptee.parent == parent

    adapter.inject()
    assert adapter.parent == parent
    assert adaptee.parent == adapter
    assert adapter in iter(parent)
    assert adaptee not in iter(parent)

    adapter.eject()
    assert adapter.parent is None
    assert adaptee.parent == parent
    assert adapter not in iter(parent)
    assert adaptee in iter(parent)


def test_weighted_module_adapter_structural_copy(chain: fl.Chain) -> None:
    parent = chain.Chain
    adaptee = parent.Linear

    DummyLinearAdapter(adaptee).inject(parent)

    clone = chain.structural_copy()
    cloned_adapter = clone.Chain.DummyLinearAdapter
    assert cloned_adapter.parent == clone.Chain
    assert cloned_adapter.target == adaptee


def test_chain_adapter_structural_copy(chain: fl.Chain) -> None:
    # Chain adapters cannot be copied by default
    adapter = DummyChainAdapter(chain.Chain).inject()

    with pytest.raises(RuntimeError):
        chain.structural_copy()

    adapter.eject()
    chain.structural_copy()


def test_adapter_preserves_output(chain: fl.Chain) -> None:
    x = jnp.ones((1, 2))
    before = chain(x)
    parent = chain.Chain
    adapter = DummyLinearAdapter(parent.Linear).inject(parent)
    after = chain(x)
    assert jnp.allclose(before, after)
    adapter.eject()
    assert jnp.allclose(chain(x), before)
