from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.model import (
    SDXLAutoencoder,
    StableDiffusion_XL,
)
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.self_attention_guidance import SDXLSAGAdapter
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.text_encoder import DoubleTextEncoder
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLUNet

__all__ = [
    "SDXLAutoencoder",
    "StableDiffusion_XL",
    "SDXLSAGAdapter",
    "DoubleTextEncoder",
    "SDXLUNet",
]
