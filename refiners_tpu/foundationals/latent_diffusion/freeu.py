"""FreeU (arXiv:2309.11497): FFT-filtered skips + scaled backbone features.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/freeu.py
(fourier_filter :17, SDFreeUAdapter :73). NHWC: channels last, FFT over the
spatial axes (1, 2).
"""

from __future__ import annotations

from typing import Any, Callable, Generic, TypeVar

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.adapters.adapter import Adapter
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.unet import SD1UNet
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLUNet
from refiners_tpu.foundationals.latent_diffusion.unet import ResidualConcatenator

T = TypeVar("T", bound="SD1UNet | SDXLUNet")
TSDFreeUAdapter = TypeVar("TSDFreeUAdapter", bound="SDFreeUAdapter[Any]")


def fourier_filter(x: jax.Array, scale: float = 1, threshold: int = 1) -> jax.Array:
    """Scale the low-frequency band of the spatial spectrum (freeu.py:17)."""
    b, height, width, c = x.shape
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    x_freq = jnp.fft.fftn(xf, axes=(1, 2))
    x_freq = jnp.fft.fftshift(x_freq, axes=(1, 2))
    mask = jnp.ones((b, height, width, c), dtype=jnp.float32)
    cr, cc = height // 2, width // 2
    mask = mask.at[:, cr - threshold : cr + threshold, cc - threshold : cc + threshold, :].set(scale)
    x_freq = x_freq * mask
    x_freq = jnp.fft.ifftshift(x_freq, axes=(1, 2))
    return jnp.fft.ifftn(x_freq, axes=(1, 2)).real.astype(dtype)


class FreeUBackboneFeatures(fl.Module):
    def __init__(self, backbone_scale: float) -> None:
        super().__init__()
        self.backbone_scale = backbone_scale

    def forward(self, x: jax.Array) -> jax.Array:
        num_half_channels = x.shape[-1] // 2
        scaled = x[..., :num_half_channels] * self.backbone_scale
        return jnp.concatenate([scaled, x[..., num_half_channels:]], axis=-1)


class FreeUSkipFeatures(fl.Chain):
    def __init__(self, n: int, skip_scale: float) -> None:
        apply_filter: Callable[[jax.Array], jax.Array] = lambda x: fourier_filter(x, scale=skip_scale)
        super().__init__(
            fl.UseContext(context="unet", key="residuals").compose(lambda residuals: residuals[n]),
            fl.Lambda(apply_filter),
        )


class FreeUResidualConcatenator(fl.Concatenate):
    def __init__(self, n: int, backbone_scale: float, skip_scale: float) -> None:
        super().__init__(
            FreeUBackboneFeatures(backbone_scale),
            FreeUSkipFeatures(n, skip_scale),
            dim=-1,
        )


class SDFreeUAdapter(Generic[T], fl.Chain, Adapter[T]):
    def __init__(self, target: T, backbone_scales: list[float], skip_scales: list[float]) -> None:
        assert len(backbone_scales) == len(skip_scales)
        assert len(backbone_scales) <= len(target.layer("UpBlocks", fl.Chain))
        self.backbone_scales = backbone_scales
        self.skip_scales = skip_scales
        with self.setup_adapter(target):
            super().__init__(target)

    def inject(self: TSDFreeUAdapter, parent: fl.Chain | None = None) -> TSDFreeUAdapter:
        for n, (backbone_scale, skip_scale) in enumerate(zip(self.backbone_scales, self.skip_scales)):
            block = self.target.UpBlocks[n]
            concat = block.ensure_find(ResidualConcatenator)
            block.replace(concat, FreeUResidualConcatenator(-n - 2, backbone_scale, skip_scale))
        return super().inject(parent)

    def eject(self) -> None:
        for n in range(len(self.backbone_scales)):
            block = self.target.layer(("UpBlocks", n), fl.Chain)
            concat = block.ensure_find(FreeUResidualConcatenator)
            block.replace(concat, ResidualConcatenator(-n - 2))
        super().eject()
