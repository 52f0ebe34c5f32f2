"""Tiled VAE inference machinery.

The reference validates tiling perceptually with pretrained weights
(/root/reference/tests/foundationals/latent_diffusion/test_autoencoders.py:67-120);
offline we pin the machinery exactly instead: with a LOCAL linear codec
(nearest 8× down/upsample) substituted for encode/decode, the tile grid,
overlap accounting and blending normalization must reassemble the untiled
result bit-for-bit (a weighted average of identical local values is the
value). Context-manager and FixedGroupNorm lifecycle match the reference's
error-handling tests.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion import manual_seed
from refiners_tpu.foundationals.latent_diffusion import SD1Autoencoder
from refiners_tpu.foundationals.latent_diffusion.auto_encoder import FixedGroupNorm


@pytest.fixture(scope="module")
def ae() -> SD1Autoencoder:
    manual_seed(0)
    return SD1Autoencoder()


def _stub_codec(ae: SD1Autoencoder) -> None:
    """Replace encode/decode with LOCAL linear maps (8× nearest resample)."""

    def encode(x: jnp.ndarray) -> jnp.ndarray:  # (1,h,w,3) -> (1,h/8,w/8,4)
        down = x[:, ::8, ::8, :]
        extra = jnp.mean(down, axis=-1, keepdims=True)
        return jnp.concatenate([down, extra], axis=-1)

    def decode(z: jnp.ndarray) -> jnp.ndarray:  # (1,lh,lw,4) -> (1,8lh,8lw,3)
        up = jnp.repeat(jnp.repeat(z[..., :3], 8, axis=1), 8, axis=2)
        return up

    ae.encode = encode  # type: ignore[method-assign]
    ae.decode = decode  # type: ignore[method-assign]


def _image(width: int, height: int, seed: int = 1) -> Image.Image:
    rs = np.random.RandomState(seed)
    return Image.fromarray((rs.rand(height, width, 3) * 255).astype(np.uint8))


@pytest.mark.parametrize(
    "size,tile,blending",
    [
        ((256, 256), (64, 64), 32),  # square, many tiles
        ((256, 192), (64, 64), 32),  # rectangular image
        ((256, 256), (64, 128), 32),  # rectangular tiles
        ((128, 128), (512, 512), 64),  # tile larger than image → single tile
        ((120, 128), (64, 64), 16),  # width not a tile multiple
        ((136, 128), (64, 64), 16),  # width just past a tile boundary
    ],
)
def test_tiled_reassembles_untiled_with_local_codec(ae: SD1Autoencoder, size, tile, blending) -> None:
    _stub_codec(ae)
    try:
        image = _image(*size)
        with ae.tiled_inference(image, tile_size=tile, blending=blending):
            latents = ae.tiled_image_to_latents(image)
            x = np.asarray(image, np.float32)[None] / 255.0
            expected_latents = np.asarray(ae.encode(jnp.asarray(2 * x - 1)))
            np.testing.assert_allclose(np.asarray(latents), expected_latents, atol=1e-5)

            result = ae.tiled_latents_to_image(latents)
            assert result.size == image.size
            expected_pixels = np.asarray(ae.decode(latents))
            got_pixels = np.asarray(result, np.float32)[None] / 255.0 * 2 - 1
            # tensor_to_image quantizes to uint8: bound by half a bin
            np.testing.assert_allclose(got_pixels, np.clip(expected_pixels, -1, 1), atol=1 / 127)
    finally:
        del ae.encode, ae.decode  # restore class methods


def test_tiled_methods_require_context(ae: SD1Autoencoder) -> None:
    image = _image(64, 64)
    with pytest.raises(ValueError, match="context manager not active"):
        ae.tiled_image_to_latents(image)
    with pytest.raises(ValueError, match="context manager not active"):
        ae.tiled_latents_to_image(jnp.zeros((1, 8, 8, 4)))


def test_fixed_group_norm_lifecycle(ae: SD1Autoencoder) -> None:
    """Inside tiled_inference every GroupNorm is wrapped by FixedGroupNorm
    with frozen statistics; on exit the tree and weights are restored."""
    _stub_codec(ae)
    try:
        n_gn = len(list(ae.layers(fl.GroupNorm, recurse=True)))
        before = {k: np.asarray(v) for k, v in ae.state_dict().items()}
        image = _image(128, 128)
        with ae.tiled_inference(image, tile_size=(64, 64)):
            fixed = list(ae.layers(FixedGroupNorm, recurse=True))
            assert len(fixed) == n_gn > 0
            # the wrapped GroupNorm is held as the adapter target (not a child)
            assert all(isinstance(f.target, fl.GroupNorm) for f in fixed)
            # (the stats warm-up runs through encode/decode, stubbed out here;
            # the slow real-VAE test below exercises the frozen-stats path)
        assert len(list(ae.layers(FixedGroupNorm, recurse=True))) == 0
        assert len(list(ae.layers(fl.GroupNorm, recurse=True))) == n_gn  # restored
        after = ae.state_dict()
        assert before.keys() == after.keys()
        for k in before:
            np.testing.assert_array_equal(before[k], np.asarray(after[k]))
    finally:
        del ae.encode, ae.decode


@pytest.mark.slow
def test_real_vae_tiled_roundtrip_finite(ae: SD1Autoencoder) -> None:
    """Real (random-weight) VAE: tiled encode/decode runs, shapes line up,
    outputs stay finite, and frozen GN statistics make tiles consistent."""
    image = _image(128, 128, seed=3)
    with ae.tiled_inference(image, tile_size=(64, 64), blending=32):
        latents = ae.tiled_image_to_latents(image)
        assert latents.shape == (1, 16, 16, 4)
        assert bool(jnp.all(jnp.isfinite(latents)))
        result = ae.tiled_latents_to_image(latents)
        assert result.size == (128, 128)
