"""SD1.5 MultiDiffusion.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/stable_diffusion_1/multi_diffusion.py:17.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from refiners_tpu.foundationals.latent_diffusion.multi_diffusion import DiffusionTarget, MultiDiffusion
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.model import StableDiffusion_1


@dataclass(kw_only=True)
class SD1DiffusionTarget(DiffusionTarget):
    clip_text_embedding: jax.Array
    condition_scale: float = 7.0


class SD1MultiDiffusion(MultiDiffusion[SD1DiffusionTarget]):
    def __init__(self, sd: StableDiffusion_1) -> None:
        self.sd = sd

    def diffuse_target(self, x: jax.Array, step: int, target: SD1DiffusionTarget) -> jax.Array:
        old_solver = self.sd.solver
        self.sd.solver = target.solver
        result = self.sd(
            x,
            step,
            clip_text_embedding=target.clip_text_embedding,
            condition_scale=target.condition_scale,
        )
        self.sd.solver = old_solver
        return result
