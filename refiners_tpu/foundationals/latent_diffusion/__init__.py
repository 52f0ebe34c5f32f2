from refiners_tpu.foundationals.latent_diffusion.auto_encoder import LatentDiffusionAutoencoder
from refiners_tpu.foundationals.latent_diffusion.freeu import SDFreeUAdapter
from refiners_tpu.foundationals.latent_diffusion.lora import SDLoraManager
from refiners_tpu.foundationals.latent_diffusion.model import LatentDiffusionModel
from refiners_tpu.foundationals.latent_diffusion.multi_diffusion import DiffusionTarget, MultiDiffusion
from refiners_tpu.foundationals.latent_diffusion.ella_adapter import ELLA, ELLAAdapter
from refiners_tpu.foundationals.latent_diffusion.reference_only_control import ReferenceOnlyControlAdapter
from refiners_tpu.foundationals.latent_diffusion.restart import Restart
from refiners_tpu.foundationals.latent_diffusion.style_aligned import StyleAlignedAdapter
from refiners_tpu.foundationals.latent_diffusion.solvers import (
    DDIM,
    DDPM,
    DPMSolver,
    Euler,
    FrankenSolver,
    LCMSolver,
    ModelPredictionType,
    NoiseSchedule,
    Solver,
    SolverParams,
    TimestepSpacing,
)
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1 import (
    SD1Autoencoder,
    SD1UNet,
    StableDiffusion_1,
    StableDiffusion_1_Inpainting,
)
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import (
    DoubleTextEncoder,
    SDXLAutoencoder,
    SDXLUNet,
    StableDiffusion_XL,
)

from refiners_tpu.foundationals.clip.text_encoder import CLIPTextEncoderL
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1 import (
    SD1ControlnetAdapter,
    SD1ELLAAdapter,
    SD1IPAdapter,
    SD1T2IAdapter,
)
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import (
    SDXLIPAdapter,
    SDXLLcmAdapter,
    SDXLT2IAdapter,
)
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.control_lora import ControlLoraAdapter

__all__ = [
    "CLIPTextEncoderL",
    "ControlLoraAdapter",
    "ELLA",
    "ELLAAdapter",
    "SD1ELLAAdapter",
    "SDXLLcmAdapter",
    "ReferenceOnlyControlAdapter",
    "StyleAlignedAdapter",
    "SDFreeUAdapter",
    "SDLoraManager",
    "DiffusionTarget",
    "MultiDiffusion",
    "Restart",
    "SD1ControlnetAdapter",
    "SD1IPAdapter",
    "SD1T2IAdapter",
    "SDXLIPAdapter",
    "SDXLT2IAdapter",
    "DoubleTextEncoder",
    "SDXLAutoencoder",
    "SDXLUNet",
    "StableDiffusion_XL",
    "LatentDiffusionAutoencoder",
    "LatentDiffusionModel",
    "DDIM",
    "DDPM",
    "DPMSolver",
    "Euler",
    "FrankenSolver",
    "LCMSolver",
    "ModelPredictionType",
    "NoiseSchedule",
    "Solver",
    "SolverParams",
    "TimestepSpacing",
    "SD1Autoencoder",
    "SD1UNet",
    "StableDiffusion_1",
    "StableDiffusion_1_Inpainting",
]
