"""Stable Diffusion 1.5 model facade.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/stable_diffusion_1/model.py
(StableDiffusion_1 :25, SD1Autoencoder :15, StableDiffusion_1_Inpainting :216).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from refiners_tpu.fluxion.utils import image_to_tensor, interpolate
from refiners_tpu.foundationals.clip.text_encoder import CLIPTextEncoderL
from refiners_tpu.foundationals.latent_diffusion.auto_encoder import LatentDiffusionAutoencoder
from refiners_tpu.foundationals.latent_diffusion.model import LatentDiffusionModel
from refiners_tpu.foundationals.latent_diffusion.solvers import DPMSolver, Solver
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.self_attention_guidance import SD1SAGAdapter
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.unet import SD1UNet


class SD1Autoencoder(LatentDiffusionAutoencoder):
    """SD1.5 VAE: scale 0.18215 (model.py:15-22)."""

    encoder_scale: float = 0.18215


class StableDiffusion_1(LatentDiffusionModel):
    """SD1.5: CLIP-L + SD1UNet + VAE; default DPM++ 30 steps, CFG 7.5."""

    unet: SD1UNet
    clip_text_encoder: CLIPTextEncoderL
    lda: SD1Autoencoder

    def __init__(
        self,
        unet: SD1UNet | None = None,
        lda: SD1Autoencoder | None = None,
        clip_text_encoder: CLIPTextEncoderL | None = None,
        solver: Solver | None = None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__(
            unet=unet or SD1UNet(in_channels=4),
            lda=lda or SD1Autoencoder(),
            clip_text_encoder=clip_text_encoder or CLIPTextEncoderL(),
            solver=solver or DPMSolver(num_inference_steps=30),
            device=device,
            dtype=dtype,
        )

    def __call__(
        self, x: jax.Array, step: int | jax.Array, *, clip_text_embedding: jax.Array, condition_scale: float = 7.5, **kwargs: Any
    ) -> jax.Array:
        return super().__call__(
            x, step, clip_text_embedding=clip_text_embedding, condition_scale=condition_scale, **kwargs
        )

    def compute_clip_text_embedding(self, text: str | list[str], negative_text: str | list[str] = "") -> jax.Array:
        """CLIP embedding with CFG negative-prompt stacking (model.py:114)."""
        text = [text] if isinstance(text, str) else text
        if not self.classifier_free_guidance:
            return self.clip_text_encoder(text)
        negative_text = [negative_text] if isinstance(negative_text, str) else negative_text
        assert len(text) == len(negative_text), "The length of the text list and negative_text should be the same"
        conditional_embedding = self.clip_text_encoder(text)
        negative_embedding = self.clip_text_encoder(negative_text)
        return jnp.concatenate((negative_embedding, conditional_embedding))

    def set_unet_context(self, *, timestep: jax.Array, clip_text_embedding: jax.Array, **_: Any) -> None:
        self.unet.set_timestep(timestep=timestep)
        self.unet.set_clip_text_embedding(clip_text_embedding=clip_text_embedding)

    def set_self_attention_guidance(self, enable: bool, scale: float = 1.0) -> None:
        if enable:
            if sag := self._find_sag_adapter():
                sag.scale = scale
            else:
                SD1SAGAdapter(target=self.unet, scale=scale).inject()
        else:
            if sag := self._find_sag_adapter():
                sag.eject()

    def has_self_attention_guidance(self) -> bool:
        return self._find_sag_adapter() is not None

    def _find_sag_adapter(self) -> SD1SAGAdapter | None:
        for p in self.unet.get_parents():
            if isinstance(p, SD1SAGAdapter):
                return p
        return None

    def compute_self_attention_guidance(
        self, x: jax.Array, noise: jax.Array, step: int | jax.Array, *, clip_text_embedding: jax.Array, **kwargs: Any
    ) -> jax.Array:
        """Extra degraded-latent unet pass scaled by SAG (model.py:176-213)."""
        sag = self._find_sag_adapter()
        assert sag is not None

        degraded_latents = sag.compute_degraded_latents(
            solver=self.solver, latents=x, noise=noise, step=step, classifier_free_guidance=True
        )
        timestep = self.solver.timesteps[step][None]
        negative_embedding, _ = jnp.split(clip_text_embedding, 2, axis=0)
        self.set_unet_context(timestep=timestep, clip_text_embedding=negative_embedding, **kwargs)
        if "ip_adapter" in self.unet.provider.contexts:
            ip_adapter_context = self.unet.use_context("ip_adapter")
            image_embedding_copy = ip_adapter_context["clip_image_embedding"]
            ip_adapter_context["clip_image_embedding"], _ = jnp.split(
                ip_adapter_context["clip_image_embedding"], 2, axis=0
            )
            degraded_noise = self.unet(degraded_latents)
            ip_adapter_context["clip_image_embedding"] = image_embedding_copy
        else:
            degraded_noise = self.unet(degraded_latents)
        return sag.scale * (noise - degraded_noise)


class StableDiffusion_1_Inpainting(StableDiffusion_1):
    """9-channel SD1.5 inpainting (model.py:216)."""

    _pytree_ignore = StableDiffusion_1._pytree_ignore  # mask/target latents ARE pytree state

    def __init__(
        self,
        unet: SD1UNet | None = None,
        lda: SD1Autoencoder | None = None,
        clip_text_encoder: CLIPTextEncoderL | None = None,
        solver: Solver | None = None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.mask_latents: jax.Array | None = None
        self.target_image_latents: jax.Array | None = None
        super().__init__(
            unet=unet or SD1UNet(in_channels=9),
            lda=lda,
            clip_text_encoder=clip_text_encoder,
            solver=solver,
            device=device,
            dtype=dtype,
        )

    def predict_noise(
        self, x: jax.Array, step: int | jax.Array, *, clip_text_embedding: jax.Array, condition_scale: float = 7.5, **_: Any
    ) -> jax.Array:
        assert self.mask_latents is not None
        assert self.target_image_latents is not None
        # concat mask + masked-image latents on the channel axis each step;
        # works identically under forward() and the scanned diffuse() loop
        x = jnp.concatenate((x[..., :4], self.mask_latents, self.target_image_latents), axis=-1)
        return super().predict_noise(
            x, step, clip_text_embedding=clip_text_embedding, condition_scale=condition_scale
        )

    def set_inpainting_conditions(
        self,
        target_image: Image.Image,
        mask: Image.Image,
        latents_size: tuple[int, int] = (64, 64),
    ) -> tuple[jax.Array, jax.Array]:
        """Mask + masked-image latents for channel concat (model.py:259)."""
        target_image = target_image.convert(mode="RGB")
        mask = mask.convert(mode="L")

        mask_tensor = jnp.asarray(np.array(mask).astype(np.float32) / 255.0)
        mask_tensor = (mask_tensor > 0.5)[None, :, :, None].astype(self.dtype or jnp.float32)
        self.mask_latents = interpolate(mask_tensor, latents_size)

        init_image_tensor = image_to_tensor(target_image, dtype=self.dtype) * 2 - 1
        masked_init_image = init_image_tensor * (1 - mask_tensor)
        self.target_image_latents = self.lda.encode(masked_init_image)
        return self.mask_latents, self.target_image_latents

    def compute_self_attention_guidance(
        self, x: jax.Array, noise: jax.Array, step: int | jax.Array, *, clip_text_embedding: jax.Array, **kwargs: Any
    ) -> jax.Array:
        sag = self._find_sag_adapter()
        assert sag is not None
        assert self.mask_latents is not None
        assert self.target_image_latents is not None

        degraded_latents = sag.compute_degraded_latents(
            solver=self.solver, latents=x, noise=noise, step=step, classifier_free_guidance=True
        )
        degraded = jnp.concatenate((degraded_latents, self.mask_latents, self.target_image_latents), axis=-1)

        timestep = self.solver.timesteps[step][None]
        negative_embedding, _ = jnp.split(clip_text_embedding, 2, axis=0)
        self.set_unet_context(timestep=timestep, clip_text_embedding=negative_embedding, **kwargs)
        degraded_noise = self.unet(degraded)
        return sag.scale * (noise - degraded_noise)
