"""Stable Diffusion XL model facade.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/stable_diffusion_xl/model.py
(StableDiffusion_XL :22, SDXLAutoencoder :12).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from refiners_tpu.foundationals.latent_diffusion.auto_encoder import LatentDiffusionAutoencoder
from refiners_tpu.foundationals.latent_diffusion.model import LatentDiffusionModel
from refiners_tpu.foundationals.latent_diffusion.solvers import DDIM, Solver
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.self_attention_guidance import SDXLSAGAdapter
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.text_encoder import DoubleTextEncoder
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLUNet


class SDXLAutoencoder(LatentDiffusionAutoencoder):
    """SDXL VAE: scale 0.13025 (model.py:12-19)."""

    encoder_scale: float = 0.13025


class StableDiffusion_XL(LatentDiffusionModel):
    """SDXL: DoubleTextEncoder + SDXLUNet + VAE; default DDIM 30 steps, CFG 5.0."""

    unet: SDXLUNet
    clip_text_encoder: DoubleTextEncoder
    lda: SDXLAutoencoder

    def __init__(
        self,
        unet: SDXLUNet | None = None,
        lda: SDXLAutoencoder | None = None,
        clip_text_encoder: DoubleTextEncoder | None = None,
        solver: Solver | None = None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__(
            unet=unet or SDXLUNet(in_channels=4),
            lda=lda or SDXLAutoencoder(),
            clip_text_encoder=clip_text_encoder or DoubleTextEncoder(),
            solver=solver or DDIM(num_inference_steps=30),
            device=device,
            dtype=dtype,
        )

    def __call__(
        self,
        x: jax.Array,
        step: int | jax.Array,
        *,
        clip_text_embedding: jax.Array,
        pooled_text_embedding: jax.Array,
        time_ids: jax.Array,
        condition_scale: float = 5.0,
        **kwargs: Any,
    ) -> jax.Array:
        return super().__call__(
            x,
            step,
            clip_text_embedding=clip_text_embedding,
            pooled_text_embedding=pooled_text_embedding,
            time_ids=time_ids,
            condition_scale=condition_scale,
            **kwargs,
        )

    def compute_clip_text_embedding(
        self, text: str | list[str], negative_text: str | list[str] = ""
    ) -> tuple[jax.Array, jax.Array]:
        """Text + pooled embedding with CFG negative stacking (model.py:87)."""
        text = [text] if isinstance(text, str) else text
        if not self.classifier_free_guidance:
            return self.clip_text_encoder(text)
        negative_text = [negative_text] if isinstance(negative_text, str) else negative_text
        assert len(text) == len(negative_text), "The length of the text list and negative_text should be the same"

        conditional_embedding, conditional_pooled = self.clip_text_encoder(text)
        negative_embedding, negative_pooled = self.clip_text_encoder(negative_text)
        return (
            jnp.concatenate((negative_embedding, conditional_embedding), axis=0),
            jnp.concatenate((negative_pooled, conditional_pooled), axis=0),
        )

    @property
    def default_time_ids(self) -> jax.Array:
        """[orig_h, orig_w, crop_top, crop_left, target_h, target_w]
        micro-conditioning (model.py:114-119, arXiv:2307.01952 §2.2)."""
        time_ids = jnp.asarray([1024, 1024, 0, 0, 1024, 1024])
        return jnp.tile(time_ids[None], (2 if self.classifier_free_guidance else 1, 1))

    def set_unet_context(
        self,
        *,
        timestep: jax.Array,
        clip_text_embedding: jax.Array,
        pooled_text_embedding: jax.Array,
        time_ids: jax.Array,
        **_: Any,
    ) -> None:
        self.unet.set_timestep(timestep=timestep)
        self.unet.set_clip_text_embedding(clip_text_embedding=clip_text_embedding)
        self.unet.set_pooled_text_embedding(pooled_text_embedding=pooled_text_embedding)
        self.unet.set_time_ids(time_ids=time_ids)

    def set_self_attention_guidance(self, enable: bool, scale: float = 1.0) -> None:
        if enable:
            if sag := self._find_sag_adapter():
                sag.scale = scale
            else:
                SDXLSAGAdapter(target=self.unet, scale=scale).inject()
        else:
            if sag := self._find_sag_adapter():
                sag.eject()

    def has_self_attention_guidance(self) -> bool:
        return self._find_sag_adapter() is not None

    def _find_sag_adapter(self) -> SDXLSAGAdapter | None:
        for p in self.unet.get_parents():
            if isinstance(p, SDXLSAGAdapter):
                return p
        return None

    def compute_self_attention_guidance(
        self,
        x: jax.Array,
        noise: jax.Array,
        step: int | jax.Array,
        *,
        clip_text_embedding: jax.Array,
        pooled_text_embedding: jax.Array,
        time_ids: jax.Array,
        **kwargs: Any,
    ) -> jax.Array:
        sag = self._find_sag_adapter()
        assert sag is not None

        degraded_latents = sag.compute_degraded_latents(
            solver=self.solver, latents=x, noise=noise, step=step, classifier_free_guidance=True
        )
        negative_text_embedding, _ = jnp.split(clip_text_embedding, 2, axis=0)
        negative_pooled, _ = jnp.split(pooled_text_embedding, 2, axis=0)
        timestep = self.solver.timesteps[step][None]
        time_ids, _ = jnp.split(time_ids, 2, axis=0)

        self.set_unet_context(
            timestep=timestep,
            clip_text_embedding=negative_text_embedding,
            pooled_text_embedding=negative_pooled,
            time_ids=time_ids,
        )
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
