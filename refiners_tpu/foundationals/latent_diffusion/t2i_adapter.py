"""T2I-Adapter (arXiv:2302.08453): condition feature pyramid added to UNet skips.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/t2i_adapter.py
(ConditionEncoder :91, ConditionEncoderXL :127, T2IFeatures :164, T2IAdapter :172).
NHWC; PixelUnshuffle matches torch channel ordering so checkpoints convert 1:1.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Generic, TypeVar

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.adapters.adapter import Adapter
from refiners_tpu.fluxion.context import Contexts

if TYPE_CHECKING:
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.unet import SD1UNet
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLUNet

T = TypeVar("T", bound="SD1UNet | SDXLUNet")
TT2IAdapter = TypeVar("TT2IAdapter", bound="T2IAdapter[Any]")


class Downsample2d(fl.Module):
    """2× average pooling, NHWC."""

    def __init__(self, scale_factor: int) -> None:
        super().__init__()
        self.scale_factor = scale_factor

    def forward(self, x: jax.Array) -> jax.Array:
        k = self.scale_factor
        summed = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, window_dimensions=(1, k, k, 1), window_strides=(1, k, k, 1), padding="VALID"
        )
        return summed / (k * k)


class ResidualBlock(fl.Residual):
    def __init__(self, channels: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__(
            fl.Conv2d(in_channels=channels, out_channels=channels, kernel_size=3, padding=1, device=device, dtype=dtype),
            fl.ReLU(),
            fl.Conv2d(in_channels=channels, out_channels=channels, kernel_size=1, device=device, dtype=dtype),
        )


class ResidualBlocks(fl.Chain):
    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        num_residual_blocks: int = 2,
        downsample: bool = False,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        preproc = Downsample2d(scale_factor=2) if downsample else fl.Identity()
        shortcut = (
            fl.Conv2d(in_channels=in_channels, out_channels=out_channels, kernel_size=1, device=device, dtype=dtype)
            if in_channels != out_channels
            else fl.Identity()
        )
        super().__init__(
            preproc,
            shortcut,
            fl.Chain(ResidualBlock(channels=out_channels, device=device, dtype=dtype) for _ in range(num_residual_blocks)),
        )


class StatefulResidualBlocks(fl.Chain):
    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        num_residual_blocks: int = 2,
        downsample: bool = False,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__(
            ResidualBlocks(
                in_channels=in_channels,
                out_channels=out_channels,
                num_residual_blocks=num_residual_blocks,
                downsample=downsample,
                device=device,
                dtype=dtype,
            ),
            fl.SetContext(context="t2iadapter", key="features", callback=self.push),
        )

    def push(self, features: list[jax.Array], x: jax.Array) -> None:
        features.append(x)


class ConditionEncoder(fl.Chain):
    """PixelUnshuffle condition pyramid (t2i_adapter.py:91)."""

    def __init__(
        self,
        in_channels: int = 3,
        channels: tuple[int, int, int, int] = (320, 640, 1280, 1280),
        num_residual_blocks: int = 2,
        downscale_factor: int = 8,
        scale: float = 1.0,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.scale = scale
        super().__init__(
            fl.PixelUnshuffle(downscale_factor=downscale_factor),
            fl.Conv2d(
                in_channels=in_channels * downscale_factor**2,
                out_channels=channels[0],
                kernel_size=3,
                padding=1,
                device=device,
                dtype=dtype,
            ),
            StatefulResidualBlocks(channels[0], channels[0], num_residual_blocks, device=device, dtype=dtype),
            *(
                StatefulResidualBlocks(
                    channels[i - 1], channels[i], num_residual_blocks, downsample=True, device=device, dtype=dtype
                )
                for i in range(1, len(channels))
            ),
            fl.UseContext(context="t2iadapter", key="features"),
        )

    def init_context(self) -> Contexts:
        return {"t2iadapter": {"features": []}}


class ConditionEncoderXL(ConditionEncoder, fl.Chain):
    """SDXL variant: downscale 16, single mid-pyramid downsample (t2i_adapter.py:127)."""

    def __init__(
        self,
        in_channels: int = 3,
        channels: tuple[int, int, int, int] = (320, 640, 1280, 1280),
        num_residual_blocks: int = 2,
        downscale_factor: int = 16,
        scale: float = 1.0,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.scale = scale
        fl.Chain.__init__(
            self,
            fl.PixelUnshuffle(downscale_factor=downscale_factor),
            fl.Conv2d(
                in_channels=in_channels * downscale_factor**2,
                out_channels=channels[0],
                kernel_size=3,
                padding=1,
                device=device,
                dtype=dtype,
            ),
            StatefulResidualBlocks(channels[0], channels[0], num_residual_blocks, device=device, dtype=dtype),
            StatefulResidualBlocks(channels[0], channels[1], num_residual_blocks, device=device, dtype=dtype),
            StatefulResidualBlocks(
                channels[1], channels[2], num_residual_blocks, downsample=True, device=device, dtype=dtype
            ),
            StatefulResidualBlocks(channels[2], channels[3], num_residual_blocks, device=device, dtype=dtype),
            fl.UseContext(context="t2iadapter", key="features"),
        )


class T2IFeatures(fl.Residual):
    """Add scaled condition feature #index to the passing activation."""

    def __init__(self, name: str, index: int, scale: float = 1.0) -> None:
        self.name = name
        self.index = index
        self.scale = scale
        super().__init__(
            fl.UseContext(context="t2iadapter", key=f"condition_features_{self.name}").compose(
                func=lambda features: self.scale * features[self.index]
            )
        )


class T2IAdapter(Generic[T], fl.Chain, Adapter[T]):
    _pytree_ignore = fl.Chain._pytree_ignore | {"_condition_encoder", "_features"}

    _condition_encoder: list[ConditionEncoder]
    _features: list[T2IFeatures] = []

    def __init__(
        self,
        target: T,
        name: str,
        condition_encoder: ConditionEncoder,
        weights: dict[str, jax.Array] | None = None,
    ) -> None:
        self.name = name
        if weights is not None:
            condition_encoder.load_state_dict(weights)
        self._condition_encoder = [condition_encoder]
        with self.setup_adapter(target):
            super().__init__(target)

    @property
    def condition_encoder(self) -> ConditionEncoder:
        return self._condition_encoder[0]

    def compute_condition_features(self, condition: jax.Array) -> tuple[jax.Array, ...]:
        return self.condition_encoder(condition)

    def set_condition_features(self, features: tuple[jax.Array, ...]) -> None:
        self.set_context("t2iadapter", {f"condition_features_{self.name}": features})

    @property
    def scale(self) -> float:
        return self._features[0].scale

    @scale.setter
    def scale(self, value: float) -> None:
        for f in self._features:
            f.scale = value

    def init_context(self) -> Contexts:
        return {"t2iadapter": {f"condition_features_{self.name}": None}}

    def structural_copy(self: "TT2IAdapter") -> "TT2IAdapter":
        raise RuntimeError("T2I-Adapter cannot be copied, eject it first.")
