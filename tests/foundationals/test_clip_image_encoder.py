"""CLIP image encoder parity vs the reference and transformers (small config)."""

import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


def test_image_encoder_matches_reference_and_transformers() -> None:
    import jax.numpy as jnp
    from refiners.foundationals.clip.image_encoder import CLIPImageEncoder as RefEncoder
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from refiners_tpu.conversion.models.clip_maps import clip_image_diffusers_key_map, clip_image_reshapes
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.conversion.utils import KeyMapRecipe
    from refiners_tpu.foundationals.clip.image_encoder import CLIPImageEncoder

    kw = dict(
        image_size=32,
        embedding_dim=64,
        output_dim=48,
        patch_size=8,
        num_layers=2,
        num_attention_heads=4,
        feedforward_dim=128,
    )
    torch.manual_seed(0)
    ref = RefEncoder(**kw).eval()
    ours = CLIPImageEncoder(**kw)
    load_reference_state_dict(ours, {k: v.detach().numpy() for k, v in ref.state_dict().items()})

    rs = np.random.RandomState(0)
    x = rs.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(ours(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expected, atol=1e-4)

    # upstream path: a transformers vision tower converts through the
    # generated recipe and matches the transformers forward
    hf = CLIPVisionModelWithProjection(
        CLIPVisionConfig(
            hidden_size=64,
            intermediate_size=128,
            projection_dim=48,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=8,
            hidden_act="gelu",  # ViT-H uses plain GELU (transformers defaults to quick_gelu)
        )
    ).eval()
    recipe = KeyMapRecipe(
        key_map=clip_image_diffusers_key_map(num_layers=2),
        tensor_reshapes=clip_image_reshapes(embedding_dim=64),
    )
    ours2 = CLIPImageEncoder(**kw)
    converted = recipe.convert({k: v.detach().numpy() for k, v in hf.state_dict().items()}, ours2)
    ours2.load_state_dict(converted)
    with torch.no_grad():
        expected2 = hf(pixel_values=torch.from_numpy(x.copy())).image_embeds.numpy()
    got2 = np.asarray(ours2(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got2, expected2, atol=1e-4)
