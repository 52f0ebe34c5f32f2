from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.model import (
    SD1Autoencoder,
    StableDiffusion_1,
    StableDiffusion_1_Inpainting,
)
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.self_attention_guidance import SD1SAGAdapter
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.unet import SD1UNet

__all__ = [
    "SD1Autoencoder",
    "StableDiffusion_1",
    "StableDiffusion_1_Inpainting",
    "SD1SAGAdapter",
    "SD1UNet",
]
