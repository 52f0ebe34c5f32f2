"""MultiUpscaler end-to-end smoke test (random weights through real checkpoints
on disk) and SDXL adapter inject/eject."""

from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

VOCAB = Path("/root/reference/src/refiners/foundationals/clip/bpe_simple_vocab_16e6.txt.gz")


@pytest.mark.skipif(not VOCAB.exists(), reason="CLIP vocab unavailable")
def test_multi_upscaler_runs(tmp_path: Path) -> None:
    from PIL import Image

    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.fluxion.utils import save_to_safetensors
    from refiners_tpu.foundationals.clip import CLIPTextEncoderL
    from refiners_tpu.foundationals.latent_diffusion import SD1Autoencoder, SD1UNet
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.controlnet import Controlnet
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.multi_upscaler import (
        MultiUpscaler,
        UpscalerCheckpoints,
    )

    manual_seed(0)
    paths = {}
    for name, module in [
        ("unet", SD1UNet(in_channels=4)),
        ("clip", CLIPTextEncoderL()),
        ("lda", SD1Autoencoder()),
        ("controlnet", Controlnet(name="tile")),
    ]:
        paths[name] = tmp_path / f"{name}.safetensors"
        save_to_safetensors(paths[name], module.state_dict())
        del module

    upscaler = MultiUpscaler(
        UpscalerCheckpoints(
            unet=paths["unet"],
            clip_text_encoder=paths["clip"],
            lda=paths["lda"],
            controlnet_tile=paths["controlnet"],
        )
    )
    image = Image.fromarray(np.random.RandomState(0).randint(0, 255, (64, 64, 3), dtype=np.uint8))
    out = upscaler.upscale(
        image,
        upscale_factor=2,
        tile_size=(16, 16),  # latent 16x16 → one tile (min_overlap 8 must stay < tile)
        num_inference_steps=2,
        denoise_strength=0.5,
    )
    assert out.size == (128, 128)


def test_sdxl_ip_and_t2i_adapters_inject_eject() -> None:
    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import SDXLUNet
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.image_prompt import SDXLIPAdapter
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.t2i_adapter import SDXLT2IAdapter

    manual_seed(2)
    unet = SDXLUNet(in_channels=4)
    base_module_count = sum(1 for _ in unet.walk(recurse=True))

    ip = SDXLIPAdapter(unet)
    ip.inject()
    assert sum(1 for _ in unet.walk(recurse=True)) != base_module_count
    ip.eject()
    assert sum(1 for _ in unet.walk(recurse=True)) == base_module_count

    t2i = SDXLT2IAdapter(unet, name="canny")
    t2i.inject()
    assert sum(1 for _ in unet.walk(recurse=True)) != base_module_count
    t2i.eject()
    assert sum(1 for _ in unet.walk(recurse=True)) == base_module_count
