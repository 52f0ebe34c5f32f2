"""IC-Light: relighting via patched SD1.5 (background latent concat).

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/stable_diffusion_1/ic_light.py:13.
Patches the UNet input conv to 8 channels (zero-init extension) and adds the
patch weights onto the UNet state dict.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from PIL import Image

from refiners_tpu.fluxion import layers as fl
from refiners_tpu.foundationals.clip.text_encoder import CLIPTextEncoderL
from refiners_tpu.foundationals.latent_diffusion.solvers.solver import Solver
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.model import (
    SD1Autoencoder,
    StableDiffusion_1,
)
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.unet import DownBlocks, SD1UNet


class ICLight(StableDiffusion_1):
    """Text-conditioned relighting model (ic_light.py:13)."""

    def __init__(
        self,
        patch_weights: dict[str, jax.Array],
        unet: SD1UNet,
        lda: SD1Autoencoder | None = None,
        clip_text_encoder: CLIPTextEncoderL | None = None,
        solver: Solver | None = None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__(
            unet=unet, lda=lda, clip_text_encoder=clip_text_encoder, solver=solver, device=device, dtype=dtype
        )
        self._ic_light_condition: jax.Array | None = None
        self._extend_conv_in()
        self._apply_patch(weights=patch_weights)

    def _extend_conv_in(self) -> None:
        """Extend the UNet input conv to 8 channels, zero-init extension."""
        down_blocks = self.unet.ensure_find(DownBlocks)
        first_block = down_blocks.layer(0, fl.Chain)
        conv_in = first_block.ensure_find(fl.Conv2d)
        new_conv_in = fl.Conv2d(
            in_channels=conv_in.in_channels + 4,
            out_channels=conv_in.out_channels,
            kernel_size=conv_in.kernel_size,
            padding=conv_in.padding,
            dtype=conv_in.dtype,
        )
        # HWIO: input-channel axis is 2
        w = jnp.zeros_like(new_conv_in.weight)
        w = w.at[:, :, :4, :].set(conv_in.weight)
        new_conv_in.weight = w
        new_conv_in.bias = conv_in.bias
        first_block.replace(old_module=conv_in, new_module=new_conv_in)

    def _apply_patch(self, weights: dict[str, jax.Array]) -> None:
        """Add the patch deltas onto the UNet state dict."""
        current = self.unet.state_dict()
        new_state_dict = {
            key: tensor + jnp.asarray(weights[key]).astype(tensor.dtype) for key, tensor in current.items()
        }
        self.unet.load_state_dict(new_state_dict)

    @staticmethod
    def compute_gray_composite(image: Image.Image, mask: Image.Image) -> Image.Image:
        """Composite onto the 127-gray background IC-Light expects."""
        assert mask.mode == "L", "Mask must be a grayscale image"
        assert image.size == mask.size, "Image and mask must have the same size"
        background = Image.new("RGB", image.size, (127, 127, 127))
        return Image.composite(image, background, mask)

    def set_ic_light_condition(self, image: Image.Image, mask: Image.Image | None = None) -> None:
        if mask is not None:
            image = self.compute_gray_composite(image=image, mask=mask)
        self._ic_light_condition = self.lda.image_to_latents(image)

    def predict_noise(
        self, x: jax.Array, step: int | jax.Array, *, clip_text_embedding: jax.Array, condition_scale: float = 2.0, **_: Any
    ) -> jax.Array:
        assert self._ic_light_condition is not None, "Reference image not set, use `set_ic_light_condition` first"
        x = jnp.concatenate((x[..., :4], self._ic_light_condition), axis=-1)
        return super().predict_noise(
            x, step, clip_text_embedding=clip_text_embedding, condition_scale=condition_scale
        )

    def __call__(
        self, x: jax.Array, step: int | jax.Array, *, clip_text_embedding: jax.Array, condition_scale: float = 2.0, **kwargs: Any
    ) -> jax.Array:
        return super().__call__(
            x, step, clip_text_embedding=clip_text_embedding, condition_scale=condition_scale, **kwargs
        )
