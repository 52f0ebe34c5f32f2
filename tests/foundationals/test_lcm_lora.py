"""add_lcm_lora: filtered projection pass, validity map, scale plumbing."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_add_lcm_lora_projection_pass() -> None:
    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.fluxion.adapters.lora import LoraAdapter
    from refiners_tpu.foundationals.latent_diffusion import SDLoraManager
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import StableDiffusion_XL, add_lcm_lora
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.model import SDXLUNet
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLCrossAttention

    manual_seed(0)

    class _SD:
        pass

    sd = _SD()
    sd.unet = SDXLUNet(in_channels=4)
    sd.clip_text_encoder = fl.Chain(fl.Linear(4, 4))
    sd.__class__ = type("FakeSDXL", (StableDiffusion_XL,), {})  # satisfy isinstance without full build
    manager = SDLoraManager(sd)  # type: ignore[arg-type]

    # kohya names for every proj_in/proj_out Linear, in walk order; block
    # prefixes must satisfy add_lcm_lora's validity map
    containers = list(sd.unet.layers(SDXLCrossAttention))
    assert len(containers) == 11
    block_names = (
        ["down_blocks_1"] * 2 + ["down_blocks_2"] * 2 + ["mid_block"] + ["up_blocks_0"] * 3 + ["up_blocks_1"] * 3
    )
    counters: dict[str, int] = {}
    rank = 4
    rs = np.random.RandomState(0)
    tensors: dict[str, jnp.ndarray] = {}
    for name, container in zip(block_names, containers):
        idx = counters.get(name, 0)
        counters[name] = idx + 1
        for chain_name, sfx in [("Chain_1", "proj_in"), ("Chain_3", "proj_out")]:
            linear = container.layer(chain_name, fl.Chain).ensure_find(fl.Linear)
            d_out, d_in = linear.weight.shape[1], linear.weight.shape[0]
            stem = f"lora_unet_{name}_attentions_{idx}_{sfx}"
            tensors[f"{stem}.lora_down.weight"] = jnp.asarray(rs.randn(rank, d_in).astype(np.float32) * 0.1)
            tensors[f"{stem}.lora_up.weight"] = jnp.asarray(rs.randn(d_out, rank).astype(np.float32) * 0.1)

    add_lcm_lora(manager, tensors, name="lcm", check_validity=True)

    adapters = list(sd.unet.layers(LoraAdapter, recurse=True))
    assert len(adapters) == 22
    assert manager.get_scale("lcm") == 8.0 / 64.0

    manager.update_scales({"lcm": 0.5})
    assert manager.get_scale("lcm") == 0.5

    manager.remove_loras("lcm")
    assert not list(sd.unet.layers(LoraAdapter, recurse=True))
