"""IP-Adapter embedding-path parity vs the reference on shared random weights.

Executes the pieces the pipeline e2e stubs out (VERDICT r4 item 2):
`ImageProjection`, `PerceiverResampler` over grid features, the fine-grained
grid encoder (`convert_to_grid_features`), and the full
`compute_clip_image_embedding` multi-image weighting / CFG-stacking math.
Reference: /root/reference/src/refiners/foundationals/latent_diffusion/
image_prompt.py:24 (ImageProjection), :183 (PerceiverResampler),
:457-525 (compute_clip_image_embedding), :553 (convert_to_grid_features);
reference e2e tests/e2e/test_diffusion.py:1900, :2045, :2086.
"""

import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


def _to_np(sd: dict) -> dict:
    return {k: v.detach().numpy() for k, v in sd.items()}


def test_image_projection_parity() -> None:
    torch.manual_seed(30)
    import jax.numpy as jnp
    from refiners.foundationals.latent_diffusion.image_prompt import ImageProjection as RefProj

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion.image_prompt import ImageProjection

    ref = RefProj(clip_image_embedding_dim=96, clip_text_embedding_dim=64, num_tokens=4).eval()
    ours = ImageProjection(clip_image_embedding_dim=96, clip_text_embedding_dim=64, num_tokens=4)
    load_reference_state_dict(ours, _to_np(ref.state_dict()))

    x = np.random.RandomState(31).randn(2, 96).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(ours(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_perceiver_resampler_parity() -> None:
    torch.manual_seed(32)
    import jax.numpy as jnp
    from refiners.foundationals.latent_diffusion.image_prompt import PerceiverResampler as RefResampler

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion.image_prompt import PerceiverResampler

    kwargs = dict(
        latents_dim=64,
        num_attention_layers=2,
        num_attention_heads=4,
        head_dim=16,
        num_tokens=8,
        input_dim=48,
        output_dim=96,
    )
    ref = RefResampler(**kwargs).eval()
    ours = PerceiverResampler(**kwargs)
    load_reference_state_dict(ours, _to_np(ref.state_dict()))

    # grid features: (batch, sequence, input_dim) like the penultimate ViT layer
    x = np.random.RandomState(33).randn(2, 17, 48).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(ours(jnp.asarray(x)))
    assert got.shape == (2, 8, 96)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def _encoder_pair(seed: int, num_layers: int = 2):
    """Reduced (reference, ours) CLIP image encoder pair with shared weights.

    Fine-grained tests need num_layers=32: the reference's
    convert_to_grid_features hard-asserts the ViT-H layer count
    (image_prompt.py:562); dims stay tiny so 32 layers are still cheap."""
    torch.manual_seed(seed)
    from refiners.foundationals.clip.image_encoder import CLIPImageEncoder as RefEnc

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.clip.image_encoder import CLIPImageEncoder

    kwargs = dict(
        image_size=32,
        embedding_dim=64,
        output_dim=48,
        patch_size=16,
        num_layers=num_layers,
        num_attention_heads=4,
        feedforward_dim=128,
    )
    ref = RefEnc(**kwargs).eval()
    ours = CLIPImageEncoder(**kwargs)
    load_reference_state_dict(ours, _to_np(ref.state_dict()))
    return ref, ours


def _adapter_pair(fine_grained: bool, seed: int):
    """(reference, ours) bare IPAdapter pair sharing encoder+projection weights.

    The target is a weight-less dummy chain: `compute_clip_image_embedding`
    touches only the image encoder and the projection, and constructing a full
    SD1UNet here would add minutes for no extra coverage (the injected
    cross-attention path has its own 10-step pipeline e2e)."""
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion.image_prompt import (
        ImageProjection as RefProj,
        IPAdapter as RefIP,
        PerceiverResampler as RefResampler,
    )

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion.image_prompt import (
        ImageProjection,
        IPAdapter,
        PerceiverResampler,
    )

    ref_enc, our_enc = _encoder_pair(seed, num_layers=32 if fine_grained else 2)
    torch.manual_seed(seed + 1)
    if fine_grained:
        kwargs = dict(
            latents_dim=64,
            num_attention_layers=2,
            num_attention_heads=4,
            head_dim=16,
            num_tokens=8,
            input_dim=64,  # encoder embedding_dim (pre-projection grid features)
            output_dim=96,
        )
        ref_proj = RefResampler(**kwargs).eval()
        our_proj = PerceiverResampler(**kwargs)
    else:
        ref_proj = RefProj(clip_image_embedding_dim=48, clip_text_embedding_dim=96, num_tokens=4).eval()
        our_proj = ImageProjection(clip_image_embedding_dim=48, clip_text_embedding_dim=96, num_tokens=4)
    load_reference_state_dict(our_proj, _to_np(ref_proj.state_dict()))

    ref_ip = RefIP(
        target=rfl.Chain(rfl.Identity()),
        clip_image_encoder=ref_enc,  # type: ignore[arg-type]
        image_proj=ref_proj,
        fine_grained=fine_grained,
    )
    our_ip = IPAdapter(
        target=fl.Chain(fl.Identity()),
        clip_image_encoder=our_enc,  # type: ignore[arg-type]
        image_proj=our_proj,
        fine_grained=fine_grained,
    )
    return ref_ip, our_ip


@pytest.mark.parametrize("fine_grained", [False, True], ids=["projection", "plus"])
def test_compute_clip_image_embedding_single(fine_grained: bool) -> None:
    import jax.numpy as jnp

    ref_ip, our_ip = _adapter_pair(fine_grained, seed=34)
    image = np.random.RandomState(35).randn(1, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        expected = ref_ip.compute_clip_image_embedding(torch.from_numpy(image.copy())).numpy()
    got = np.asarray(our_ip.compute_clip_image_embedding(jnp.asarray(image.transpose(0, 2, 3, 1))))

    # CFG-stacked: row 0 negative, row 1 conditional; fine-grained negatives
    # come from encoding a zero image, not from projecting a zero embedding
    assert got.shape == expected.shape == (2,) + expected.shape[1:]
    np.testing.assert_allclose(got, expected, atol=1e-4)


@pytest.mark.parametrize("fine_grained", [False, True], ids=["projection", "plus"])
def test_compute_clip_image_embedding_multi_image_weights(fine_grained: bool) -> None:
    """Multi-image token concat + per-image weights (image_prompt.py:457-525)."""
    import jax.numpy as jnp

    ref_ip, our_ip = _adapter_pair(fine_grained, seed=36)
    images = np.random.RandomState(37).randn(3, 3, 32, 32).astype(np.float32)
    weights = [1.0, 0.5, 2.0]

    with torch.no_grad():
        expected = ref_ip.compute_clip_image_embedding(
            torch.from_numpy(images.copy()), weights=weights
        ).numpy()
    got = np.asarray(
        our_ip.compute_clip_image_embedding(jnp.asarray(images.transpose(0, 2, 3, 1)), weights=weights)
    )

    # concat_batches=True: 3 images × num_tokens stacked on the sequence axis,
    # CFG pair on the batch axis
    assert got.shape == expected.shape
    assert got.shape[0] == 2
    np.testing.assert_allclose(got, expected, atol=1e-4)

    # concat_batches=False keeps one row per image
    with torch.no_grad():
        expected_nb = ref_ip.compute_clip_image_embedding(
            torch.from_numpy(images.copy()), weights=weights, concat_batches=False
        ).numpy()
    got_nb = np.asarray(
        our_ip.compute_clip_image_embedding(
            jnp.asarray(images.transpose(0, 2, 3, 1)), weights=weights, concat_batches=False
        )
    )
    assert got_nb.shape == expected_nb.shape
    assert got_nb.shape[0] == 6
    np.testing.assert_allclose(got_nb, expected_nb, atol=1e-4)


def test_preprocess_image_parity() -> None:
    """PIL path: resize + CLIP normalization (image_prompt.py:526-553)."""
    import jax.numpy as jnp  # noqa: F401
    from PIL import Image

    ref_ip, our_ip = _adapter_pair(False, seed=38)
    image = Image.fromarray(np.random.RandomState(39).randint(0, 255, (41, 77, 3), dtype=np.uint8))

    expected = ref_ip.preprocess_image(image, size=(32, 32)).numpy()
    got = np.asarray(our_ip.preprocess_image(image, size=(32, 32))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_grid_encoder_matches_reference_structure() -> None:
    """convert_to_grid_features drops pooling+norm+proj on both sides and the
    resulting grid features agree (image_prompt.py:553)."""
    import jax.numpy as jnp

    ref_ip, our_ip = _adapter_pair(True, seed=40)
    x = np.random.RandomState(41).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        expected = ref_ip.grid_image_encoder(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(our_ip.grid_image_encoder(jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == expected.shape  # (2, 1 + (32/16)², 64)
    np.testing.assert_allclose(got, expected, atol=1e-4)
