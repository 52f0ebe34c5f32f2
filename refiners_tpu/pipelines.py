"""High-level compiled pipelines.

Convenience wrappers that bundle prompt encoding, the scanned denoising loop
and VAE decode into cached jit programs, with optional data-parallel sharding
over a mesh. Models and the step count define the compilation key; prompts,
seeds and guidance scales are runtime inputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
from PIL import Image

from refiners_tpu.fluxion import rng
from refiners_tpu.foundationals.latent_diffusion.model import LatentDiffusionModel
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.model import StableDiffusion_XL


@dataclass
class TextToImage:
    """Compiled text-to-image pipeline for SD1.5 / SDXL.

    Example:
        pipe = TextToImage(sd15)
        image = pipe("a cute cat", negative_prompt="low quality", seed=42)
    """

    sd: LatentDiffusionModel
    size: tuple[int, int] = (512, 512)
    condition_scale: float | None = None
    _compiled: dict[Any, Any] = field(default_factory=dict)

    @property
    def _is_xl(self) -> bool:
        return isinstance(self.sd, StableDiffusion_XL)

    def _diffuse_fn(self) -> Any:
        key = ("diffuse", self._is_xl)
        if key not in self._compiled:
            if self._is_xl:
                self._compiled[key] = jax.jit(
                    lambda m, x, e, p, t, s, k: m.diffuse(
                        x,
                        clip_text_embedding=e,
                        pooled_text_embedding=p,
                        time_ids=t,
                        condition_scale=s,
                        key=k,
                    ),
                    static_argnums=(5,),
                )
            else:
                self._compiled[key] = jax.jit(
                    lambda m, x, e, s, k: m.diffuse(x, clip_text_embedding=e, condition_scale=s, key=k),
                    static_argnums=(3,),
                )
        return self._compiled[key]

    def _decode_fn(self) -> Any:
        if "decode" not in self._compiled:
            self._compiled["decode"] = jax.jit(lambda lda, z: lda.decode(z))
        return self._compiled["decode"]

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        seed: int | None = None,
        condition_scale: float | None = None,
    ) -> Image.Image:
        if seed is not None:
            key = jax.random.key(seed)
        else:
            key = rng.next_key()
        noise_key, solver_key = jax.random.split(key)

        h, w = self.size
        noise = jax.random.normal(noise_key, (1, h // 8, w // 8, 4), dtype=jnp.float32).astype(
            self.sd.unet.dtype or jnp.float32
        )
        x = self.sd.solver.scale_model_input(noise, step=-1)

        if self._is_xl:
            scale = condition_scale or self.condition_scale or 5.0
            emb, pooled = self.sd.compute_clip_text_embedding(prompt, negative_prompt)
            time_ids = self.sd.default_time_ids
            z = self._diffuse_fn()(self.sd, x, emb, pooled, time_ids, scale, solver_key)
        else:
            scale = condition_scale or self.condition_scale or 7.5
            emb = self.sd.compute_clip_text_embedding(prompt, negative_prompt)
            z = self._diffuse_fn()(self.sd, x, emb, scale, solver_key)

        image = self._decode_fn()(self.sd.lda, z)
        from refiners_tpu.fluxion.utils import tensor_to_image

        return tensor_to_image((image + 1) / 2)
