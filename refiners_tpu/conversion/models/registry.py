"""Model weight registry: hub entries + converters per model family.

Reference: /root/reference/src/refiners/conversion/models/ (21 recipe
modules) and cli.py:27-147.

Design: the reference publishes its converted checkpoints on the HF hub
("refiners/…" repos, safetensors, refiners key layout). Because our Chains
reproduce that layout, every model converts through the single generic
`convert_refiners_state_dict` (layout-only transforms) — the per-model
WeightRecipe tables collapse into hub entries + a target constructor.
Upstream-format sources (transformers/diffusers) are additionally supported
where a recipe exists (e.g. CLIP text via `hf_clip_text_recipe`) or via the
autotracing `ModelConverter`.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable

from refiners_tpu.conversion.utils import Hub


@dataclass
class ModelEntry:
    name: str
    source: Hub
    build_target: Callable[[], Any]
    description: str = ""

    def convert(self, output_path: Path | str | None = None) -> Path:
        """Download (or locate) the refiners-layout checkpoint and convert it
        to our layouts, saving a ready-to-load safetensors file."""
        from refiners_tpu.conversion.refiners_compat import convert_refiners_state_dict
        from refiners_tpu.fluxion.utils import load_from_safetensors, save_to_safetensors

        src = self.source.download()
        target = self.build_target()
        converted = convert_refiners_state_dict(load_from_safetensors(src), target, strict=False)
        out = Path(output_path) if output_path else Hub.cache_dir() / "converted" / f"{self.name}.safetensors"
        out.parent.mkdir(parents=True, exist_ok=True)
        save_to_safetensors(out, converted)
        return out


def _sd15_unet() -> Any:
    from refiners_tpu.foundationals.latent_diffusion import SD1UNet

    return SD1UNet(in_channels=4)


def _sd15_unet_inpainting() -> Any:
    from refiners_tpu.foundationals.latent_diffusion import SD1UNet

    return SD1UNet(in_channels=9)


def _sd15_autoencoder() -> Any:
    from refiners_tpu.foundationals.latent_diffusion import SD1Autoencoder

    return SD1Autoencoder()


def _sd15_text_encoder() -> Any:
    from refiners_tpu.foundationals.clip import CLIPTextEncoderL

    return CLIPTextEncoderL()

def _sdxl_unet() -> Any:
    from refiners_tpu.foundationals.latent_diffusion import SDXLUNet

    return SDXLUNet(in_channels=4)


def _sdxl_autoencoder() -> Any:
    from refiners_tpu.foundationals.latent_diffusion import SDXLAutoencoder

    return SDXLAutoencoder()


def _sdxl_text_encoder() -> Any:
    from refiners_tpu.foundationals.latent_diffusion import DoubleTextEncoder

    return DoubleTextEncoder()


def _clip_image_encoder_h() -> Any:
    from refiners_tpu.foundationals.clip import CLIPImageEncoderH

    return CLIPImageEncoderH()


def _sam_h() -> Any:
    from refiners_tpu.foundationals.segment_anything import SegmentAnythingH

    return SegmentAnythingH()


def _dinov2(variant: str) -> Callable[[], Any]:
    def build() -> Any:
        import refiners_tpu.foundationals.dinov2 as d

        return getattr(d, variant)()

    return build


def _mvanet() -> Any:
    from refiners_tpu.foundationals.swin.mvanet import MVANet

    return MVANet()


def _controlnet_sd15() -> Any:
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.controlnet import Controlnet

    return Controlnet(name="converted")


def _informative_drawings() -> Any:
    from refiners_tpu.foundationals.latent_diffusion.preprocessors import InformativeDrawings

    return InformativeDrawings()


def upstream_recipes() -> dict[str, Any]:
    """Upstream-format (diffusers/transformers/original-LDM) `KeyMapRecipe`s,
    keyed by ``<model>/<format>``.

    Mirrors the reference's per-model recipe modules
    (src/refiners/conversion/models/, 21 modules); our tables are generated
    from the architecture structure and oracle-tested against the reference's.
    """
    from refiners_tpu.conversion.models import adapters, autoencoder, clip_maps, controlnet, diffusion_unet
    from refiners_tpu.conversion.utils import KeyMapRecipe

    return {
        "sd15.unet/diffusers": KeyMapRecipe(key_map=diffusion_unet.sd15_unet_diffusers_key_map()),
        "sd15.unet/civitai": KeyMapRecipe(
            key_map=diffusion_unet.sd15_unet_civitai_key_map(), key_prefix="model.diffusion_model."
        ),
        "sdxl.unet/diffusers": KeyMapRecipe(key_map=diffusion_unet.sdxl_unet_diffusers_key_map()),
        "sdxl.unet/civitai": KeyMapRecipe(
            key_map=diffusion_unet.sdxl_unet_civitai_key_map(), key_prefix="model.diffusion_model."
        ),
        "autoencoder/diffusers": KeyMapRecipe(
            key_map=autoencoder.autoencoder_diffusers_key_map(),
            key_aliases=autoencoder.autoencoder_diffusers_key_aliases(),
        ),
        "autoencoder/civitai": KeyMapRecipe(
            key_map=autoencoder.autoencoder_civitai_key_map(),
            key_prefix="first_stage_model.",
            tensor_reshapes=autoencoder.autoencoder_attention_reshapes(),
        ),
        "controlnet.sd15/diffusers": KeyMapRecipe(key_map=controlnet.controlnet_sd15_diffusers_key_map()),
        "clip_text/transformers": KeyMapRecipe(key_map=clip_maps.clip_text_diffusers_key_map()),
        "clip_text/civitai": KeyMapRecipe(
            key_map=clip_maps.clip_text_civitai_key_map(),
            key_prefix="cond_stage_model.transformer.text_model.",
        ),
        "clip_image/transformers": KeyMapRecipe(
            key_map=clip_maps.clip_image_diffusers_key_map(),
            tensor_reshapes=clip_maps.clip_image_reshapes(),
        ),
        # SD2.1-unclip CLIP-image encoder: identical generated table, oracle-
        # tested against reference conversion/models/clip_image_sd21.py
        "clip_image.sd21_unclip/transformers": KeyMapRecipe(
            key_map=clip_maps.clip_image_diffusers_key_map(),
            tensor_reshapes=clip_maps.clip_image_reshapes(),
        ),
        "ipadapter.sd15/tencent": KeyMapRecipe(key_map=adapters.ipadapter_sd15_key_map()),
        "ipadapter.sd15_plus/tencent": KeyMapRecipe(
            key_map=adapters.ipadapter_sd15_plus_key_map(),
            tensor_reshapes=adapters.ipadapter_plus_reshapes(16, 768),
        ),
        "ipadapter.sdxl/tencent": KeyMapRecipe(key_map=adapters.ipadapter_sdxl_key_map()),
        "ipadapter.sdxl_plus/tencent": KeyMapRecipe(
            key_map=adapters.ipadapter_sdxl_plus_key_map(),
            tensor_reshapes=adapters.ipadapter_plus_reshapes(16, 1280),
        ),
        "t2iadapter/tencent": KeyMapRecipe(key_map=adapters.t2iadapter_key_map()),
        "hq_sam/sysu": KeyMapRecipe(key_map=adapters.hq_sam_key_map()),
        "preprocessor.informative_drawings/carolineec": KeyMapRecipe(
            key_map=adapters.informative_drawings_key_map()
        ),
    }


def upstream_converters() -> dict[str, Callable[[dict[str, Any]], dict[str, Any]]]:
    """Programmatic upstream converters (value transforms beyond key renames),
    keyed like `upstream_recipes`. Pipe results through
    `refiners_compat.convert_refiners_state_dict`."""
    from refiners_tpu.conversion.models import control_lora_sdxl, foundationals

    return {
        "dinov2/facebook": foundationals.convert_dinov2_facebook,
        "ella/tencent": foundationals.convert_ella_tencent,
        "mvanet/official": foundationals.convert_mvanet_official,
        "controllora.sdxl/original": control_lora_sdxl.convert_controllora_sdxl,
    }


def lora_hub() -> dict[str, Hub]:
    """Published LoRA checkpoints (download-only, runtime-loaded); mirrors
    reference conversion/models/loras.py."""
    from refiners_tpu.conversion.models.loras import ALL_LORAS

    return dict(ALL_LORAS)


def control_lora_hub() -> dict[str, Hub]:
    """Original + converted control-lora checkpoints (reference
    conversion/models/controllora_sdxl.py:320-345)."""
    from refiners_tpu.conversion.models import control_lora_sdxl as m

    return {
        "controllora.sdxl.canny/original": m.canny_original,
        "controllora.sdxl.canny": m.canny_converted,
        "controllora.sdxl.cpds/original": m.cpds_original,
        "controllora.sdxl.cpds": m.cpds_converted,
    }


REGISTRY: dict[str, ModelEntry] = {
    entry.name: entry
    for entry in [
        ModelEntry(
            "sd15.unet",
            Hub("refiners/sd15.unet", "model.safetensors"),
            _sd15_unet,
            "Stable Diffusion 1.5 UNet",
        ),
        ModelEntry(
            "sd15.unet_inpainting",
            Hub("refiners/sd15.unet_inpainting", "model.safetensors"),
            _sd15_unet_inpainting,
            "SD1.5 9-channel inpainting UNet",
        ),
        ModelEntry(
            "sd15.autoencoder",
            Hub("refiners/sd15.autoencoder", "model.safetensors"),
            _sd15_autoencoder,
            "SD1.5 VAE",
        ),
        ModelEntry(
            "sd15.text_encoder",
            Hub("refiners/sd15.text_encoder", "model.safetensors"),
            _sd15_text_encoder,
            "CLIP-L text encoder",
        ),
        ModelEntry(
            "sdxl.unet",
            Hub("refiners/sdxl.unet", "model.safetensors"),
            _sdxl_unet,
            "SDXL UNet",
        ),
        ModelEntry(
            "sdxl.autoencoder",
            Hub("refiners/sdxl.autoencoder", "model.safetensors"),
            _sdxl_autoencoder,
            "SDXL VAE (fp16-fix)",
        ),
        ModelEntry(
            "sdxl.text_encoder",
            Hub("refiners/sdxl.text_encoder", "model.safetensors"),
            _sdxl_text_encoder,
            "SDXL double text encoder",
        ),
        ModelEntry(
            "clip.image_encoder_h",
            Hub("refiners/clip.image_encoder_h", "model.safetensors"),
            _clip_image_encoder_h,
            "CLIP ViT-H image encoder (IP-Adapter)",
        ),
        ModelEntry(
            "sd21.unclip.image_encoder",
            Hub(
                "refiners/sd21.unclip.image_encoder",
                "model.safetensors",
                expected_sha256="c9f43e359e06f1a237324c4c11734d6acd7fbddbfd3b1ed4f1b525267bedb812",
            ),
            _clip_image_encoder_h,
            "SD2.1-unclip CLIP-image encoder (ViT-H)",
        ),
        ModelEntry(
            "sam.vit_h",
            Hub("refiners/sam.vit_h", "model.safetensors"),
            _sam_h,
            "Segment Anything ViT-H",
        ),
        ModelEntry(
            "controlnet.sd15.tile",
            Hub("refiners/controlnet.sd15.tile", "model.safetensors"),
            _controlnet_sd15,
            "SD1.5 ControlNet (tile)",
        ),
        ModelEntry(
            "preprocessor.informative_drawings",
            Hub("refiners/preprocessor.informative_drawings", "model.safetensors"),
            _informative_drawings,
            "Lineart preprocessor",
        ),
        ModelEntry(
            "mvanet",
            Hub("finegrain/finegrain-box-segmenter", "model.safetensors", revision="v0.1"),
            _mvanet,
            "MVANet (box segmenter)",
        ),
        *[
            ModelEntry(
                f"dinov2.{v}",
                Hub(f"refiners/dinov2.{v}", "model.safetensors"),
                _dinov2(f"DINOv2_{v}"),
                f"DINOv2 {v}",
            )
            for v in ["small", "base", "large", "giant", "small_reg", "base_reg", "large_reg", "giant_reg"]
        ],
    ]
}
