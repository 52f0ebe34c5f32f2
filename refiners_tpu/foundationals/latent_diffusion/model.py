"""LatentDiffusionModel base.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/model.py:15.
Owns unet + lda + clip_text_encoder + solver; `forward` is one denoise step
(context set → CFG batch → unet → guidance combine → solver update) designed
to be jitted as a whole and scanned over steps (`steps` / `diffuse`).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, TypeVar

import jax
import jax.numpy as jnp
from PIL import Image

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion import rng
from refiners_tpu.foundationals.latent_diffusion.auto_encoder import LatentDiffusionAutoencoder
from refiners_tpu.foundationals.latent_diffusion.solvers import Solver

TLatentDiffusionModel = TypeVar("TLatentDiffusionModel", bound="LatentDiffusionModel")


class LatentDiffusionModel(fl.Module, ABC):
    def __init__(
        self,
        unet: fl.Chain,
        lda: LatentDiffusionAutoencoder,
        clip_text_encoder: fl.Chain,
        solver: Solver,
        classifier_free_guidance: bool = True,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__()
        self.unet = unet.to(dtype=dtype) if dtype is not None else unet
        self.lda = lda.to(dtype=dtype) if dtype is not None else lda
        self.clip_text_encoder = clip_text_encoder.to(dtype=dtype) if dtype is not None else clip_text_encoder
        self.solver = solver
        self.classifier_free_guidance = classifier_free_guidance

    def set_inference_steps(self, num_steps: int, first_step: int = 0) -> None:
        """Set step count; `first_step = round((1-strength)·(num_steps-1))`
        for img2img (model.py:35)."""
        self.solver = self.solver.rebuild(num_inference_steps=num_steps, first_inference_step=first_step)

    @staticmethod
    def sample_noise(
        size: tuple[int, ...],
        device: Any = None,
        dtype: Any = None,
        offset_noise: float | None = None,
        key: jax.Array | None = None,
    ) -> jax.Array:
        """Gaussian noise with optional offset-noise (model.py:47); NHWC —
        the offset term broadcasts per (batch, channel)."""
        key = key if key is not None else rng.next_key()
        k1, k2 = jax.random.split(key)
        noise = jax.random.normal(k1, size, dtype=jnp.float32)
        if offset_noise is not None:
            b, c = size[0], size[-1]
            noise = noise + offset_noise * jax.random.normal(k2, (b, 1, 1, c), dtype=jnp.float32)
        return noise.astype(dtype or jnp.float32)

    def init_latents(
        self,
        size: tuple[int, int],
        init_image: Image.Image | None = None,
        noise: jax.Array | None = None,
    ) -> jax.Array:
        """Fresh or img2img latents, pre-scaled for the solver (model.py:68)."""
        height, width = size
        latent_height = height // 8
        latent_width = width // 8
        if noise is None:
            noise = self.sample_noise(size=(1, latent_height, latent_width, 4), dtype=self.dtype)
        assert tuple(noise.shape[1:3]) == (
            latent_height,
            latent_width,
        ), f"noise shape is not compatible: {noise.shape}, with size: {size}"
        if init_image is None:
            latent = noise
        else:
            resized = init_image.resize(size=(width, height))
            encoded_image = self.lda.image_to_latents(resized)
            latent = self.solver.add_noise(encoded_image, noise, self.solver.first_inference_step)
        return self.solver.scale_model_input(latent, step=-1)

    @property
    def steps(self) -> list[int]:
        return self.solver.inference_steps

    @abstractmethod
    def set_unet_context(self, *, timestep: jax.Array, clip_text_embedding: jax.Array, **_: jax.Array) -> None: ...

    @abstractmethod
    def set_self_attention_guidance(self, enable: bool, scale: float = 1.0) -> None: ...

    @abstractmethod
    def has_self_attention_guidance(self) -> bool: ...

    @abstractmethod
    def compute_self_attention_guidance(
        self, x: jax.Array, noise: jax.Array, step: int | jax.Array, *, clip_text_embedding: jax.Array, **kwargs: Any
    ) -> jax.Array: ...

    def predict_noise(
        self,
        x: jax.Array,
        step: int | jax.Array,
        *,
        clip_text_embedding: jax.Array,
        condition_scale: float = 7.5,
        **kwargs: Any,
    ) -> jax.Array:
        """CFG-combined noise prediction for one step (model.py:128-154)."""
        if self.classifier_free_guidance:
            assert clip_text_embedding.shape[0] % 2 == 0, f"invalid batch size: {clip_text_embedding.shape[0]}"

        timestep = self.solver.timesteps[step][None]
        self.set_unet_context(timestep=timestep, clip_text_embedding=clip_text_embedding, **kwargs)

        latents = jnp.concatenate((x, x)) if self.classifier_free_guidance else x
        latents = self.solver.scale_model_input(latents, step=step)

        if self.classifier_free_guidance:
            prediction = self.unet(latents)
            unconditional_prediction, conditional_prediction = jnp.split(prediction, 2, axis=0)
            predicted_noise = unconditional_prediction + condition_scale * (
                conditional_prediction - unconditional_prediction
            )
            if self.has_self_attention_guidance():
                predicted_noise = predicted_noise + self.compute_self_attention_guidance(
                    x=x[..., :4],
                    noise=unconditional_prediction,
                    step=step,
                    clip_text_embedding=clip_text_embedding,
                    **kwargs,
                )
        else:
            predicted_noise = self.unet(latents)
        return predicted_noise

    def forward(
        self,
        x: jax.Array,
        step: int | jax.Array,
        *,
        clip_text_embedding: jax.Array,
        condition_scale: float = 7.5,
        solver_key: jax.Array | None = None,
        **kwargs: Any,
    ) -> jax.Array:
        """One denoise step (model.py:128-159)."""
        predicted_noise = self.predict_noise(
            x, step, clip_text_embedding=clip_text_embedding, condition_scale=condition_scale, **kwargs
        )
        # keep only the 4 latent channels (inpainting concatenates more)
        return self.solver(x[..., :4], predicted_noise=predicted_noise, step=step, key=solver_key)

    def diffuse(
        self,
        x: jax.Array,
        *,
        clip_text_embedding: jax.Array,
        condition_scale: float = 7.5,
        key: jax.Array | None = None,
        **kwargs: Any,
    ) -> jax.Array:
        """Full denoising loop as one `lax.scan` — THE jit unit on TPU.

        Wrap in jit with the model as a pytree argument:
        ``jax.jit(lambda sd, x, emb: sd.diffuse(x, clip_text_embedding=emb))``.
        The 30-step loop compiles to a single XLA while-op: one device
        program, no host round-trips between steps.
        """
        first = self.solver.first_inference_step
        num = self.solver.num_inference_steps
        steps = jnp.arange(first, num)
        if key is None:
            key = rng.next_key()
        keys = jax.random.split(key, num - first)
        state0 = self.solver.init_state()
        if isinstance(state0, jax.Array):  # multistep solvers carry a latent-shaped estimate
            state0 = jnp.broadcast_to(state0, x[..., :4].shape).astype(jnp.float32)

        def body(carry: tuple[jax.Array, jax.Array], inp: tuple[jax.Array, jax.Array]):
            latents, state = carry
            step, k = inp
            noise = self.predict_noise(
                latents, step, clip_text_embedding=clip_text_embedding, condition_scale=condition_scale, **kwargs
            )
            latents4, state = self.solver.step(latents[..., :4], noise, step, state, key=k)
            if latents.shape[-1] > 4:
                latents = jnp.concatenate([latents4, latents[..., 4:]], axis=-1)
            else:
                latents = latents4
            return (latents, state), None

        (x, _), _ = jax.lax.scan(body, (x, state0), (steps, keys))
        return x[..., :4]

    def structural_copy(self: TLatentDiffusionModel) -> TLatentDiffusionModel:
        return self.__class__(
            unet=self.unet.structural_copy(),
            lda=self.lda.structural_copy(),
            clip_text_encoder=self.clip_text_encoder.structural_copy(),
            solver=self.solver,
        )
