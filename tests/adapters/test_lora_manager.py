"""SDLoraManager bookkeeping semantics.

Mirrors /root/reference/tests/adapters/test_lora_manager.py (add, add
multiple, remove, remove_all, get, scales, names) with synthesized kohya
state dicts against the real SD1 stack — offline, no downloaded weights.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion import manual_seed
from refiners_tpu.fluxion.adapters.lora import Lora, LoraAdapter
from refiners_tpu.foundationals.latent_diffusion import SDLoraManager, StableDiffusion_1

_RANK = 4

pytestmark = pytest.mark.slow  # builds the full SD1 stack once (module scope)


@pytest.fixture(scope="module")
def sd() -> StableDiffusion_1:
    manual_seed(0)
    return StableDiffusion_1()


@pytest.fixture(scope="module")
def lora_weights(sd: StableDiffusion_1) -> dict[str, jnp.ndarray]:
    """Kohya-style state dict covering every cross-attention Linear, named in
    walk order so auto-attach is unambiguous."""
    from refiners_tpu.foundationals.latent_diffusion.cross_attention import CrossAttentionBlock

    rs = np.random.RandomState(3)
    weights: dict[str, jnp.ndarray] = {}
    n = 0
    for block in sd.unet.layers(CrossAttentionBlock, recurse=True):
        for linear in block.layers(fl.Linear, recurse=True):
            d_in, d_out = linear.weight.shape  # ours is (in, out)
            base = f"lora_unet_L{n:04d}"
            weights[f"{base}.lora_down.weight"] = jnp.asarray(rs.randn(_RANK, d_in).astype(np.float32) * 0.1)
            weights[f"{base}.lora_up.weight"] = jnp.asarray(rs.randn(d_out, _RANK).astype(np.float32) * 0.1)
            n += 1
    return weights


@pytest.fixture()
def manager(sd: StableDiffusion_1) -> SDLoraManager:
    mgr = SDLoraManager(sd)
    yield mgr
    mgr.remove_all()
    assert len(list(sd.unet.layers(LoraAdapter, recurse=True))) == 0


_KW = dict(unet_inclusions=["CrossAttentionBlock"])


def test_add_loras(manager: SDLoraManager, lora_weights: dict) -> None:
    manager.add_loras("pokemon-lora", tensors=lora_weights, **_KW)
    assert "pokemon-lora" in manager.names
    with pytest.raises(AssertionError, match="already exists"):
        manager.add_loras("pokemon-lora", tensors=lora_weights, **_KW)
    expected = len(lora_weights) // 2
    assert len(manager.loras) == expected
    assert len(manager.get_loras_by_name("pokemon-lora")) == expected


def test_add_multiple_loras(manager: SDLoraManager, lora_weights: dict) -> None:
    manager.add_loras("pokemon-lora", tensors=lora_weights, **_KW)
    manager.add_loras("pokemon-lora2", tensors=lora_weights, **_KW)
    assert set(manager.names) == {"pokemon-lora", "pokemon-lora2"}
    # both stack on the same targets: one adapter, two loras each
    adapter = next(iter(manager.lora_adapters))
    assert sorted(adapter.names) == ["pokemon-lora", "pokemon-lora2"]


def test_remove_loras(manager: SDLoraManager, lora_weights: dict) -> None:
    manager.add_loras("one", tensors=lora_weights, **_KW)
    manager.add_loras("two", tensors=lora_weights, **_KW)
    manager.remove_loras("one")
    assert manager.names == ["two"]
    manager.remove_loras("two")
    assert manager.names == []
    assert len(manager.lora_adapters) == 0  # empty adapters ejected


def test_remove_all(manager: SDLoraManager, lora_weights: dict) -> None:
    manager.add_loras("one", tensors=lora_weights, **_KW)
    manager.add_loras("two", tensors=lora_weights, **_KW)
    manager.remove_all()
    assert manager.names == []
    assert len(manager.lora_adapters) == 0


def test_get_lora_weights_roundtrip(manager: SDLoraManager, lora_weights: dict) -> None:
    manager.add_loras("style", tensors=lora_weights, **_KW)
    stored = manager.get_lora_weights("style")
    assert len(stored) == len(lora_weights)
    got = sorted(np.asarray(w).ravel()[0] for k, w in stored.items() if k.endswith("down.weight"))
    expected = sorted(np.asarray(w).ravel()[0] for k, w in lora_weights.items() if "down" in k)
    np.testing.assert_allclose(got, expected)


def test_scales(manager: SDLoraManager, lora_weights: dict) -> None:
    manager.add_loras("one", tensors=lora_weights, scale=0.4, **_KW)
    manager.add_loras("two", tensors=lora_weights, scale=-0.5, **_KW)
    assert manager.get_scale("one") == 0.4
    assert manager.get_scale("two") == -0.5
    assert manager.scales == {"one": 0.4, "two": -0.5}
    manager.update_scales({"one": 0.7, "two": 1.3})
    assert manager.scales == {"one": 0.7, "two": 1.3}
    with pytest.raises(AssertionError, match="subset"):
        manager.update_scales({"three": 1.0})


def test_scale_is_effective(manager: SDLoraManager, lora_weights: dict, sd: StableDiffusion_1) -> None:
    """A LoRA at scale 0 must be numerically inert; nonzero scales act."""
    proj = next(iter(manager.target.unet.layers(Lora, recurse=True)), None)
    assert proj is None  # clean slate

    x = jnp.asarray(np.random.RandomState(5).randn(1, 16, 16, 4).astype(np.float32))
    text = jnp.asarray(np.random.RandomState(6).randn(1, 77, 768).astype(np.float32))

    def run() -> np.ndarray:
        sd.unet.set_timestep(jnp.asarray([500]))
        sd.unet.set_clip_text_embedding(text)
        return np.asarray(sd.unet(x))

    base = run()
    manager.add_loras("style", tensors=lora_weights, scale=1.0, **_KW)
    one = run()
    manager.update_scales({"style": 0.0})
    zero = run()

    np.testing.assert_allclose(zero, base, atol=1e-6)
    assert np.abs(one - base).max() > 1e-4  # the LoRA does something
