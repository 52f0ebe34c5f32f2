"""Generated upstream key maps vs the reference's literal recipe tables.

The reference ships hand-written ~950/2200-line key tables
(src/refiners/conversion/models/*.py); we generate ours from the architecture
structure. These tests use the reference tables as oracles: every entry must
match exactly.
"""

import pytest

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


def _assert_same_map(ours: dict[str, str], oracle: dict[str, str]) -> None:
    missing = {k: v for k, v in oracle.items() if k not in ours}
    extra = {k: v for k, v in ours.items() if k not in oracle}
    wrong = {k: (ours[k], v) for k, v in oracle.items() if k in ours and ours[k] != v}
    assert not missing, f"missing {len(missing)}: {dict(list(missing.items())[:5])}"
    assert not extra, f"extra {len(extra)}: {dict(list(extra.items())[:5])}"
    assert not wrong, f"wrong {len(wrong)}: {dict(list(wrong.items())[:5])}"


def test_sd15_unet_diffusers_map() -> None:
    from refiners.conversion.models.unet_sd15 import diffusers_recipe

    from refiners_tpu.conversion.models.diffusion_unet import sd15_unet_diffusers_key_map

    _assert_same_map(sd15_unet_diffusers_key_map(), diffusers_recipe.key_map)


def test_sd15_unet_civitai_map() -> None:
    from refiners.conversion.models.unet_sd15 import civitai_recipe

    from refiners_tpu.conversion.models.diffusion_unet import sd15_unet_civitai_key_map

    _assert_same_map(sd15_unet_civitai_key_map(), civitai_recipe.key_map)


def test_sdxl_unet_diffusers_map() -> None:
    from refiners.conversion.models.unet_sdxl import diffusers_recipe

    from refiners_tpu.conversion.models.diffusion_unet import sdxl_unet_diffusers_key_map

    _assert_same_map(sdxl_unet_diffusers_key_map(), diffusers_recipe.key_map)


def test_sdxl_unet_civitai_map() -> None:
    from refiners.conversion.models.unet_sdxl import civitai_recipe

    from refiners_tpu.conversion.models.diffusion_unet import sdxl_unet_civitai_key_map

    _assert_same_map(sdxl_unet_civitai_key_map(), civitai_recipe.key_map)


def test_autoencoder_maps() -> None:
    from refiners.conversion.models.autoencoder_sd15 import civitai_recipe, diffusers_recipe

    from refiners_tpu.conversion.models.autoencoder import (
        autoencoder_attention_reshapes,
        autoencoder_civitai_key_map,
        autoencoder_diffusers_key_aliases,
        autoencoder_diffusers_key_map,
    )

    _assert_same_map(autoencoder_diffusers_key_map(), diffusers_recipe.key_map)
    _assert_same_map(autoencoder_diffusers_key_aliases(), diffusers_recipe.key_aliases)
    _assert_same_map(autoencoder_civitai_key_map(), civitai_recipe.key_map)
    assert autoencoder_attention_reshapes() == civitai_recipe.tensor_reshapes


def test_controlnet_sd15_map() -> None:
    from refiners.conversion.models.controlnet_sd15 import diffusers_recipe

    from refiners_tpu.conversion.models.controlnet import controlnet_sd15_diffusers_key_map

    _assert_same_map(controlnet_sd15_diffusers_key_map(), diffusers_recipe.key_map)


def test_clip_text_maps() -> None:
    from refiners.conversion.models.clip_text_sd15 import civitai_recipe, diffusers_recipe

    from refiners_tpu.conversion.models.clip_maps import clip_text_civitai_key_map, clip_text_diffusers_key_map

    _assert_same_map(clip_text_diffusers_key_map(), diffusers_recipe.key_map)
    _assert_same_map(clip_text_civitai_key_map(), civitai_recipe.key_map)
    assert civitai_recipe.key_prefix == "cond_stage_model.transformer.text_model."


def test_clip_image_map() -> None:
    from refiners.conversion.models.clip_image_sd21 import diffusers_recipe

    from refiners_tpu.conversion.models.clip_maps import clip_image_diffusers_key_map, clip_image_reshapes

    _assert_same_map(clip_image_diffusers_key_map(), diffusers_recipe.key_map)
    assert clip_image_reshapes() == diffusers_recipe.tensor_reshapes


def test_ipadapter_maps() -> None:
    from refiners.conversion.models import ipadapter_sd15, ipadapter_sdxl

    from refiners_tpu.conversion.models.adapters import (
        ipadapter_plus_reshapes,
        ipadapter_sd15_key_map,
        ipadapter_sd15_plus_key_map,
        ipadapter_sdxl_key_map,
        ipadapter_sdxl_plus_key_map,
    )

    _assert_same_map(ipadapter_sd15_key_map(), ipadapter_sd15.diffusers_recipe.key_map)
    _assert_same_map(ipadapter_sd15_plus_key_map(), ipadapter_sd15.diffusers_plus_recipe.key_map)
    _assert_same_map(ipadapter_sdxl_key_map(), ipadapter_sdxl.diffusers_recipe.key_map)
    _assert_same_map(ipadapter_sdxl_plus_key_map(), ipadapter_sdxl.plus_diffusers_recipe.key_map)
    assert ipadapter_plus_reshapes(16, 768) == ipadapter_sd15.diffusers_plus_recipe.tensor_reshapes
    assert ipadapter_plus_reshapes(16, 1280) == ipadapter_sdxl.plus_diffusers_recipe.tensor_reshapes


def test_t2iadapter_maps() -> None:
    from refiners.conversion.models import t2iadapter_sd15, t2iadapter_sdxl

    from refiners_tpu.conversion.models.adapters import t2iadapter_key_map

    _assert_same_map(t2iadapter_key_map(), t2iadapter_sd15.diffusers_recipe.key_map)
    _assert_same_map(t2iadapter_key_map(), t2iadapter_sdxl.diffusers_recipe.key_map)


def test_hq_sam_map() -> None:
    from refiners.conversion.models.hq_sam import recipe

    from refiners_tpu.conversion.models.adapters import hq_sam_key_map

    _assert_same_map(hq_sam_key_map(), recipe.key_map)


def test_preprocessors_map() -> None:
    from refiners.conversion.models.preprocessors import informative_drawings_recipe

    from refiners_tpu.conversion.models.adapters import informative_drawings_key_map

    _assert_same_map(informative_drawings_key_map(), informative_drawings_recipe.key_map)


@pytest.mark.slow
def test_diffusers_unet_checkpoint_roundtrip() -> None:
    """A synthetic diffusers-format SD1.5 UNet checkpoint converts to exactly
    the weights a direct reference-layout load produces."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch

    from refiners.foundationals.latent_diffusion import SD1UNet as RefUNet

    from refiners_tpu.conversion.models.diffusion_unet import sd15_unet_diffusers_key_map
    from refiners_tpu.conversion.refiners_compat import convert_refiners_state_dict
    from refiners_tpu.conversion.utils import KeyMapRecipe
    from refiners_tpu.foundationals.latent_diffusion import SD1UNet

    torch.manual_seed(3)
    ref_state = {k: v.detach().numpy() for k, v in RefUNet(in_channels=4).state_dict().items()}

    # invert the key map to synthesize the diffusers checkpoint
    key_map = sd15_unet_diffusers_key_map()
    inverse = {v: k for k, v in key_map.items()}
    diffusers_state: dict[str, np.ndarray] = {}
    for key, value in ref_state.items():
        stem, _, leaf = key.rpartition(".")
        assert stem in inverse, f"reference key {key} not covered by the diffusers map"
        diffusers_state[f"{inverse[stem]}.{leaf}"] = value

    target = SD1UNet(in_channels=4)
    got = KeyMapRecipe(key_map=key_map).convert(diffusers_state, target)
    expected = convert_refiners_state_dict(ref_state, target)
    assert got.keys() == expected.keys()
    for k in got:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(expected[k]), err_msg=k)


def test_clip_image_sd21_unclip_map() -> None:
    """Our generated CLIP-image table equals the reference's sd21-unclip
    recipe (conversion/models/clip_image_sd21.py) — key map AND reshapes."""
    from refiners.conversion.models.clip_image_sd21 import diffusers_recipe

    from refiners_tpu.conversion.models.clip_maps import clip_image_diffusers_key_map, clip_image_reshapes

    _assert_same_map(clip_image_diffusers_key_map(32), diffusers_recipe.key_map)
    assert clip_image_reshapes() == diffusers_recipe.tensor_reshapes


def test_lora_hub_matches_reference() -> None:
    """Every reference LoRA hub entry exists with the same repo/sha."""
    import refiners.conversion.models.loras as ref_loras
    from refiners.conversion.utils import Hub as RefHub

    from refiners_tpu.conversion.models.registry import lora_hub

    ours = {(h.repo_id, h.filename, h.expected_sha256) for h in lora_hub().values()}
    ref = {
        (h.repo_id, h.filename, h.expected_sha256)
        for h in vars(ref_loras).values()
        if isinstance(h, RefHub)
    }
    assert ref <= ours, f"missing lora hub entries: {ref - ours}"


def test_control_lora_hub_matches_reference() -> None:
    from refiners.conversion.models.controllora_sdxl import canny, cpds

    from refiners_tpu.conversion.models.registry import control_lora_hub

    hubs = control_lora_hub()
    for name, ref_conv in [("canny", canny), ("cpds", cpds)]:
        assert hubs[f"controllora.sdxl.{name}/original"].expected_sha256 == ref_conv.original.expected_sha256
        assert hubs[f"controllora.sdxl.{name}"].expected_sha256 == ref_conv.converted.expected_sha256
