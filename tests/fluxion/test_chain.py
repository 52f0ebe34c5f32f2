"""Chain behavior tests, mirroring the reference suite's semantics
(/root/reference/tests/fluxion/layers/test_chain.py)."""

import jax
import jax.numpy as jnp
import pytest

import refiners_tpu.fluxion.layers as fl


def test_chain_getitem() -> None:
    chain = fl.Chain(fl.Linear(1, 1), fl.Linear(1, 1), fl.SiLU())
    assert chain[0] == chain.Linear_1
    assert chain[1] == chain.Linear_2
    assert chain[2] == chain.SiLU
    assert chain["Linear_2"] == chain.Linear_2
    with pytest.raises(IndexError):
        chain[3]


def test_chain_find() -> None:
    chain = fl.Chain(fl.Linear(1, 1))
    assert isinstance(chain.find(fl.Linear), fl.Linear)
    assert chain.find(fl.Conv2d) is None
    with pytest.raises(AssertionError):
        chain.ensure_find(fl.Conv2d)


def test_chain_slice() -> None:
    chain = fl.Chain(
        fl.Linear(1, 1),
        fl.Linear(1, 1),
        fl.Linear(1, 1),
        fl.Chain(fl.Linear(1, 1), fl.Linear(1, 1)),
        fl.Linear(1, 1),
    )
    x = jnp.ones((1, 1))
    sliced = chain[1:4]
    assert len(sliced) == 3
    assert isinstance(sliced[2], fl.Chain)
    # sliced chains share weights with the original
    assert sliced[0].weight is chain[1].weight
    sliced(x)


def test_chain_walk() -> None:
    inner = fl.Chain(fl.Linear(1, 1))
    chain = fl.Chain(fl.Linear(1, 1), inner, fl.SiLU())
    matches = list(chain.walk(fl.Linear))
    assert len(matches) == 2
    assert matches[0][1] is chain
    assert matches[1][1] is inner
    all_modules = list(chain.walk())
    assert len(all_modules) == 3  # non-recursive top level
    recursed = list(chain.walk(lambda m, p: True, recurse=True))
    assert len(recursed) == 4


def test_chain_walk_stop_iteration() -> None:
    # StopIteration in the predicate prunes the subtree (chain.py walk contract)
    chain = fl.Chain(fl.Chain(fl.Linear(1, 1)), fl.Linear(2, 2))

    def predicate(m: fl.Module, p: fl.Chain) -> bool:
        if isinstance(m, fl.Chain):
            raise StopIteration
        return isinstance(m, fl.Linear)

    matches = list(chain.walk(predicate))
    assert len(matches) == 1
    assert matches[0][0].in_features == 2


def test_chain_layers() -> None:
    chain = fl.Chain(fl.Chain(fl.Chain(fl.Linear(1, 1))), fl.Chain(fl.Linear(1, 1)))
    assert len(list(chain.layers(fl.Chain))) == 2
    assert len(list(chain.layers(fl.Chain, recurse=True))) == 3


def test_chain_layer() -> None:
    chain = fl.Chain(fl.Chain(fl.Linear(4, 4), fl.SiLU()))
    assert isinstance(chain.layer(["Chain", "Linear"], fl.Linear), fl.Linear)
    assert isinstance(chain.layer(["Chain", 1]), fl.SiLU)
    with pytest.raises(AssertionError):
        chain.layer(["Chain", "Linear"], fl.Conv2d)


def test_chain_insert_append_pop_remove() -> None:
    l1, l2 = fl.Linear(1, 1), fl.Linear(1, 1)
    sub = fl.Chain(fl.SiLU())  # ContextModule child: tracks its parent
    chain = fl.Chain(l1, l2)
    chain.insert(1, sub)
    assert list(chain) == [l1, sub, l2]
    assert sub.parent is chain

    silu = fl.SiLU()
    chain.append(silu)
    assert chain[-1] is silu

    popped = chain.pop(1)
    assert popped is sub
    assert popped.parent is None

    chain.remove(silu)
    assert list(chain) == [l1, l2]


def test_chain_insert_before_after_type() -> None:
    chain = fl.Chain(fl.Linear(1, 1), fl.SiLU())
    relu = fl.ReLU()
    chain.insert_before_type(fl.SiLU, relu)
    assert chain[1] is relu
    gelu = fl.GeLU()
    chain.insert_after_type(fl.SiLU, gelu)
    assert chain[3] is gelu
    with pytest.raises(ValueError):
        chain.insert_before_type(fl.Conv2d, fl.ReLU())


def test_chain_replace() -> None:
    old = fl.SiLU()
    chain = fl.Chain(fl.Linear(1, 1), old)
    new = fl.ReLU()
    chain.replace(old, new)
    assert chain[1] is new
    with pytest.raises(ValueError):
        chain.replace(old, fl.ReLU())


def test_chain_structural_copy() -> None:
    chain = fl.Chain(fl.Linear(2, 4), fl.Chain(fl.Linear(4, 8), fl.SiLU()))
    copy = chain.structural_copy()
    assert copy is not chain
    assert copy[1] is not chain[1]  # inner chains are fresh objects...
    assert copy[0] is chain[0]  # ...weighted leaves are shared outright
    assert copy[1][0].weight is chain[1][0].weight
    x = jnp.ones((1, 2))
    assert jnp.allclose(chain(x), copy(x))
    # mutating the copy leaves the original untouched
    copy.remove(copy[1])
    assert len(copy) == 1 and len(chain) == 2


def test_chain_setattr_guard() -> None:
    chain = fl.Chain()
    with pytest.raises(ValueError):
        chain.foo = fl.Linear(1, 1)


def test_chain_keys_repr() -> None:
    chain = fl.Chain(fl.Linear(1, 1), fl.Linear(1, 1), fl.SiLU())
    assert list(chain.keys()) == ["Linear_1", "Linear_2", "SiLU"]
    assert "Linear_1" in repr(chain)


def test_chain_error_located() -> None:
    chain = fl.Chain(fl.Linear(2, 2), fl.Lambda(lambda x: x @ jnp.ones((3, 3))))
    with pytest.raises(fl.ChainError) as e:
        chain(jnp.ones((1, 2)))
    assert "Lambda" in str(e.value)


def test_use_set_context() -> None:
    class Ctx(fl.Chain):
        def init_context(self):
            return {"test": {"value": None}}

    chain = Ctx(
        fl.SetContext("test", "value"),
        fl.Lambda(lambda x: x * 0),
        fl.Sum(fl.UseContext("test", "value"), fl.Identity()),
    )
    out = chain(jnp.array([5.0]))
    assert float(out[0]) == 5.0


def test_use_context_compose() -> None:
    class Ctx(fl.Chain):
        def init_context(self):
            return {"test": {"value": None}}

    chain = Ctx(
        fl.SetContext("test", "value"),
        fl.UseContext("test", "value").compose(lambda v: v * 10),
    )
    assert float(chain(jnp.array([2.0]))[0]) == 20.0


def test_set_context_callback() -> None:
    class Ctx(fl.Chain):
        def init_context(self):
            return {"test": {"acc": []}}

    chain = Ctx(
        fl.SetContext("test", "acc", callback=lambda acc, x: acc.append(x)),
        fl.SetContext("test", "acc", callback=lambda acc, x: acc.append(x)),
        fl.UseContext("test", "acc").compose(lambda acc: sum(acc)),
    )
    assert float(chain(jnp.array([2.0]))[0]) == 4.0


def test_combinators() -> None:
    x = jnp.full((1, 4), 2.0)
    par = fl.Parallel(fl.Identity(), fl.Lambda(lambda v: v * 2))
    a, b = par(x)
    assert float(b[0, 0]) == 4.0

    dist = fl.Distribute(fl.Lambda(lambda v: v + 1), fl.Lambda(lambda v: v + 2))
    c, d = dist(x, x)
    assert float(c[0, 0]) == 3.0 and float(d[0, 0]) == 4.0
    with pytest.raises(AssertionError):
        dist(x)

    s = fl.Sum(fl.Identity(), fl.Identity())
    assert float(s(x)[0, 0]) == 4.0

    res = fl.Residual(fl.Lambda(lambda v: v * 10))
    assert float(res(x)[0, 0]) == 22.0

    cat = fl.Concatenate(fl.Identity(), fl.Identity(), dim=1)
    assert cat(x).shape == (1, 8)

    mm = fl.Matmul(fl.Identity(), fl.Transpose(0, 1))
    assert mm(x).shape == (1, 1)

    pt = fl.Passthrough(fl.Lambda(lambda v: v * 99))
    assert float(pt(x)[0, 0]) == 2.0


def test_getarg_return() -> None:
    chain = fl.Chain(fl.GetArg(1))
    out = chain(jnp.ones(1), jnp.zeros(1))
    assert float(out[0]) == 0.0


def test_chain_jit_equivalence() -> None:
    chain = fl.Chain(fl.Linear(8, 16), fl.SiLU(), fl.Linear(16, 4), fl.LayerNorm(4))
    x = jax.random.normal(jax.random.key(0), (2, 8))
    eager = chain(x)
    jitted = jax.jit(lambda m, v: m(v))(chain, x)
    assert jnp.allclose(eager, jitted, atol=1e-6)


def test_chain_jit_after_surgery() -> None:
    chain = fl.Chain(fl.Linear(8, 8), fl.Linear(8, 8))
    f = jax.jit(lambda m, v: m(v))
    x = jnp.ones((1, 8))
    y1 = f(chain, x)
    chain.replace(chain[1], fl.Linear(8, 8, bias=False))
    y2 = f(chain, x)
    assert y1.shape == y2.shape
    assert not jnp.allclose(y1, y2)


def test_chain_grad_flows() -> None:
    chain = fl.Chain(fl.Linear(4, 4), fl.SiLU(), fl.Linear(4, 1))
    x = jnp.ones((2, 4))

    def loss(m: fl.Chain, v: jax.Array) -> jax.Array:
        return jnp.sum(m(v) ** 2)

    grads = jax.grad(loss)(chain, x)
    assert grads[0].weight.shape == (4, 4)
    assert float(jnp.abs(grads[0].weight).sum()) > 0
