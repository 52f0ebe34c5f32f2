"""Structural inject/eject tests for the SD adapter zoo.

These run on the full SD1UNet without forwards (surgery is pure Python);
forward-based checks live in the slow e2e tier.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion import manual_seed
from refiners_tpu.foundationals.latent_diffusion import SD1UNet
from refiners_tpu.foundationals.latent_diffusion.freeu import FreeUResidualConcatenator, SDFreeUAdapter
from refiners_tpu.foundationals.latent_diffusion.image_prompt import ImageProjection
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1 import (
    Controlnet,
    SD1ControlnetAdapter,
    SD1SAGAdapter,
    SD1T2IAdapter,
)
from refiners_tpu.foundationals.latent_diffusion.t2i_adapter import T2IFeatures
from refiners_tpu.foundationals.latent_diffusion.unet import ResidualConcatenator


@pytest.fixture(scope="module")
def unet() -> SD1UNet:
    manual_seed(0)
    return SD1UNet(in_channels=4)


def _state_signature(module: fl.Module) -> list[str]:
    return [name for name, _ in module.named_modules()]


def test_controlnet_inject_eject(unet: SD1UNet) -> None:
    before = _state_signature(unet)
    adapter = SD1ControlnetAdapter(unet, name="canny").inject()
    assert isinstance(unet[0], Controlnet)
    # double-inject with same name refused
    with pytest.raises(AssertionError):
        SD1ControlnetAdapter(unet, name="canny").inject()
    adapter.eject()
    assert _state_signature(unet) == before


def test_controlnet_stacking(unet: SD1UNet) -> None:
    a1 = SD1ControlnetAdapter(unet, name="canny").inject()
    a2 = SD1ControlnetAdapter(unet, name="depth").inject()
    controlnets = [m for m in unet if isinstance(m, Controlnet)]
    assert {c.name for c in controlnets} == {"canny", "depth"}
    a2.eject()
    a1.eject()
    assert not any(isinstance(m, Controlnet) for m in unet)


def test_t2i_adapter_inject_eject(unet: SD1UNet) -> None:
    before = _state_signature(unet)
    adapter = SD1T2IAdapter(unet, name="pose").inject()
    feats = list(unet.layers(T2IFeatures, recurse=True))
    assert len(feats) == 4
    adapter.eject()
    assert _state_signature(unet) == before


def test_sag_adapter_inject_eject(unet: SD1UNet) -> None:
    before = _state_signature(unet)
    adapter = SD1SAGAdapter(unet).inject()
    from refiners_tpu.foundationals.latent_diffusion.self_attention_guidance import (
        SelfAttentionMap,
        SelfAttentionShape,
    )

    assert unet.ensure_find(SelfAttentionMap) is not None
    assert unet.ensure_find(SelfAttentionShape) is not None
    adapter.eject()
    assert _state_signature(unet) == before


def test_freeu_inject_eject(unet: SD1UNet) -> None:
    before = _state_signature(unet)
    adapter = SDFreeUAdapter(unet, backbone_scales=[1.2, 1.4], skip_scales=[0.9, 0.2]).inject()
    assert len(list(unet.layers(FreeUResidualConcatenator, recurse=True))) == 2
    adapter.eject()
    assert len(list(unet.layers(FreeUResidualConcatenator, recurse=True))) == 0
    assert _state_signature(unet) == before
    assert len(list(unet.layers(ResidualConcatenator, recurse=True))) == 12


def test_ip_adapter_inject_eject(unet: SD1UNet) -> None:
    from refiners_tpu.foundationals.clip.image_encoder import CLIPImageEncoderH
    from refiners_tpu.foundationals.latent_diffusion.image_prompt import IPAdapter

    before = _state_signature(unet)
    # tiny image encoder stand-in to keep the test fast
    encoder = CLIPImageEncoderH.__new__(CLIPImageEncoderH)
    fl.Chain.__init__(encoder)
    encoder.embedding_dim = 1280
    encoder.output_dim = 1024

    adapter = IPAdapter(
        target=unet,
        clip_image_encoder=encoder,
        image_proj=ImageProjection(),
        scale=0.7,
    )
    adapter.inject()
    from refiners_tpu.foundationals.latent_diffusion.image_prompt import ImageCrossAttention

    image_attns = list(unet.layers(ImageCrossAttention, recurse=True))
    assert len(image_attns) == 16  # one per text cross-attention
    assert adapter.scale == 0.7
    adapter.scale = 0.5
    assert all(a.scale == 0.5 for a in image_attns)
    adapter.eject()
    assert _state_signature(unet) == before


def test_fourier_filter_shapes() -> None:
    from refiners_tpu.foundationals.latent_diffusion.freeu import fourier_filter

    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4).astype(np.float32))
    y = fourier_filter(x, scale=0.5, threshold=1)
    assert y.shape == x.shape
    # scale=1 is the identity
    np.testing.assert_allclose(np.asarray(fourier_filter(x, scale=1.0)), np.asarray(x), atol=1e-5)


def test_multi_diffusion_tiles() -> None:
    from refiners_tpu.foundationals.latent_diffusion.multi_diffusion import MultiDiffusion, Size

    tiles = MultiDiffusion.generate_latent_tiles(Size(64, 64), Size(32, 32), min_overlap=8)
    assert all(t.bottom - t.top == 32 and t.right - t.left == 32 for t in tiles)
    # full coverage
    covered = np.zeros((64, 64))
    for t in tiles:
        covered[t.top : t.bottom, t.left : t.right] = 1
    assert covered.all()
    # single tile when tile >= size
    tiles = MultiDiffusion.generate_latent_tiles(Size(16, 16), Size(32, 32), min_overlap=8)
    assert len(tiles) == 1
