"""IC-Light patching and SDXL LCM adapter behavior (random weights)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_ic_light_patches_unet_and_denoises() -> None:
    import jax.numpy as jnp
    from PIL import Image

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.latent_diffusion import SD1UNet
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.ic_light import ICLight
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.unet import DownBlocks

    manual_seed(0)
    unet = SD1UNet(in_channels=4)
    conv_key = "DownBlocks.Chain_1.Conv2d.weight"

    # zero patch except a constant delta on the (extended) input conv
    patch = {k: np.zeros_like(np.asarray(v)) for k, v in unet.state_dict().items()}
    kh, kw, _, out = patch[conv_key].shape
    patch[conv_key] = np.full((kh, kw, 8, out), 0.25, dtype=np.float32)

    before = np.asarray(unet.state_dict()[conv_key])
    ic = ICLight(patch_weights={k: jnp.asarray(v) for k, v in patch.items()}, unet=unet)

    conv = ic.unet.ensure_find(DownBlocks).layer(0, fl.Chain).ensure_find(fl.Conv2d)
    assert conv.in_channels == 8
    after = np.asarray(conv.weight)
    # original 4 input channels keep their weights, plus the patch delta
    np.testing.assert_allclose(after[:, :, :4, :], before + 0.25, atol=1e-6)
    # the 4 new channels are zero-init plus the patch delta
    np.testing.assert_allclose(after[:, :, 4:, :], 0.25, atol=1e-6)

    image = Image.new("RGB", (64, 64), (200, 30, 30))
    mask = Image.new("L", (64, 64), 255)
    gray = ICLight.compute_gray_composite(Image.new("RGB", (64, 64), (0, 0, 0)), Image.new("L", (64, 64), 0))
    assert gray.getpixel((0, 0)) == (127, 127, 127)

    ic.set_ic_light_condition(image, mask)
    text = jnp.zeros((2, 77, 768), dtype=jnp.float32)  # CFG pair
    out_latent = ic.predict_noise(jnp.zeros((1, 8, 8, 4)), step=0, clip_text_embedding=text)
    assert out_latent.shape == (1, 8, 8, 4)
    assert bool(jnp.isfinite(out_latent).all())


def test_sdxl_lcm_adapter_inject_eject_and_forward() -> None:
    import jax.numpy as jnp

    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.latent_diffusion.range_adapter import RangeEncoder
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import SDXLLcmAdapter, SDXLUNet
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.lcm import ConditionScaleBlock

    manual_seed(1)
    unet = SDXLUNet(in_channels=4)
    base_repr = repr(unet.ensure_find(RangeEncoder))

    adapter = SDXLLcmAdapter(unet, condition_scale=8.0).inject()
    assert unet.ensure_find(RangeEncoder).find(ConditionScaleBlock) is not None
    emb = adapter.sinusoidal_embedding
    assert emb.shape == (1, 256)

    # LCM runs without CFG: single-sample conditioning
    unet.set_timestep(jnp.asarray([250]))
    unet.set_clip_text_embedding(jnp.asarray(np.random.RandomState(0).randn(1, 77, 2048).astype(np.float32)))
    unet.set_pooled_text_embedding(jnp.asarray(np.random.RandomState(1).randn(1, 1280).astype(np.float32)))
    unet.set_time_ids(jnp.zeros((1, 6)))
    out = unet(jnp.zeros((1, 8, 8, 4)))
    assert out.shape == (1, 8, 8, 4)
    assert bool(jnp.isfinite(out).all())

    adapter.set_condition_scale(4.0)
    assert not np.allclose(np.asarray(adapter.sinusoidal_embedding), np.asarray(emb))

    adapter.eject()
    assert unet.ensure_find(RangeEncoder).find(ConditionScaleBlock) is None
    assert repr(unet.ensure_find(RangeEncoder)) == base_repr
