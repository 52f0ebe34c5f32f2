"""Latent diffusion VAE (encoder/decoder) with tiled inference.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/auto_encoder.py
(Resnet :40, Encoder :83, Decoder :143, FixedGroupNorm :209,
LatentDiffusionAutoencoder :282, tiled encode/decode :466/:528,
tiled_inference :593). NHWC layout; the latent channel axis is last.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Generator, NamedTuple

import jax
import jax.numpy as jnp
from PIL import Image

from refiners_tpu.fluxion import layers as fl
from refiners_tpu.fluxion.adapters.adapter import Adapter
from refiners_tpu.fluxion.context import Contexts
from refiners_tpu.fluxion.layers import (
    Chain,
    Conv2d,
    Downsample,
    GroupNorm,
    Identity,
    Residual,
    SelfAttention2d,
    SiLU,
    Slicing,
    Sum,
    Upsample,
)
from refiners_tpu.fluxion.utils import image_to_tensor, images_to_tensor, tensor_to_image, tensor_to_images


class _ImageSize(NamedTuple):
    height: int
    width: int


class _Tile(NamedTuple):
    top: int
    left: int
    bottom: int
    right: int


class Resnet(Sum):
    """shortcut + (GN→SiLU→Conv ×2) (auto_encoder.py:40)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        num_groups: int = 32,
        device: Any = None,
        dtype: Any = None,
    ):
        self.in_channels = in_channels
        self.out_channels = out_channels
        shortcut = (
            Conv2d(in_channels=in_channels, out_channels=out_channels, kernel_size=1, device=device, dtype=dtype)
            if in_channels != out_channels
            else Identity()
        )
        super().__init__(
            shortcut,
            Chain(
                GroupNorm(channels=in_channels, num_groups=num_groups, device=device, dtype=dtype),
                SiLU(),
                Conv2d(in_channels=in_channels, out_channels=out_channels, kernel_size=3, padding=1, device=device, dtype=dtype),
                GroupNorm(channels=out_channels, num_groups=num_groups, device=device, dtype=dtype),
                SiLU(),
                Conv2d(in_channels=out_channels, out_channels=out_channels, kernel_size=3, padding=1, device=device, dtype=dtype),
            ),
        )


class Encoder(Chain):
    """128→512 resnets, mid self-attention, 2×4 latent channels; logvar half
    dropped by the trailing Slicing (auto_encoder.py:83-141)."""

    def __init__(self, device: Any = None, dtype: Any = None) -> None:
        resnet_sizes: list[int] = [128, 256, 512, 512, 512]
        input_channels: int = 3
        latent_dim: int = 8
        resnet_layers: list[Chain] = [
            Chain(
                [
                    Resnet(
                        in_channels=resnet_sizes[i - 1] if i > 0 else resnet_sizes[0],
                        out_channels=resnet_sizes[i],
                        device=device,
                        dtype=dtype,
                    ),
                    Resnet(in_channels=resnet_sizes[i], out_channels=resnet_sizes[i], device=device, dtype=dtype),
                ]
            )
            for i in range(len(resnet_sizes))
        ]
        for _, layer in zip(range(3), resnet_layers):
            channels: int = layer[-1].out_channels  # type: ignore[attr-defined]
            layer.append(Downsample(channels=channels, scale_factor=2, device=device, dtype=dtype))

        attention_layer = Residual(
            GroupNorm(channels=resnet_sizes[-1], num_groups=32, eps=1e-6, device=device, dtype=dtype),
            SelfAttention2d(channels=resnet_sizes[-1], device=device, dtype=dtype),
        )
        resnet_layers[-1].insert_after_type(Resnet, attention_layer)
        super().__init__(
            Conv2d(in_channels=input_channels, out_channels=resnet_sizes[0], kernel_size=3, padding=1, device=device, dtype=dtype),
            Chain(*resnet_layers),
            Chain(
                GroupNorm(channels=resnet_sizes[-1], num_groups=32, eps=1e-6, device=device, dtype=dtype),
                SiLU(),
                Conv2d(in_channels=resnet_sizes[-1], out_channels=latent_dim, kernel_size=3, padding=1, device=device, dtype=dtype),
            ),
            Chain(
                Conv2d(in_channels=8, out_channels=8, kernel_size=1, device=device, dtype=dtype),
                Slicing(dim=-1, end=4),  # drop logvar half (NHWC: channels last)
            ),
        )

    def init_context(self) -> Contexts:
        return {"sampling": {"shapes": []}}


class Decoder(Chain):
    """Mirror of the encoder (auto_encoder.py:143-206)."""

    def __init__(self, device: Any = None, dtype: Any = None) -> None:
        self.resnet_sizes: list[int] = [128, 256, 512, 512, 512]
        self.latent_dim: int = 4
        self.output_channels: int = 3
        resnet_sizes = self.resnet_sizes[::-1]
        resnet_layers: list[Chain] = [
            Chain(
                [
                    Resnet(
                        in_channels=resnet_sizes[i - 1] if i > 0 else resnet_sizes[0],
                        out_channels=resnet_sizes[i],
                        device=device,
                        dtype=dtype,
                    ),
                    Resnet(in_channels=resnet_sizes[i], out_channels=resnet_sizes[i], device=device, dtype=dtype),
                ]
                + (
                    [Resnet(in_channels=resnet_sizes[i], out_channels=resnet_sizes[i], device=device, dtype=dtype)]
                    if i > 0
                    else []
                )
            )
            for i in range(len(resnet_sizes))
        ]
        attention_layer = Residual(
            GroupNorm(channels=resnet_sizes[0], num_groups=32, eps=1e-6, device=device, dtype=dtype),
            SelfAttention2d(channels=resnet_sizes[0], device=device, dtype=dtype),
        )
        resnet_layers[0].insert(1, attention_layer)
        for _, layer in zip(range(3), resnet_layers[1:]):
            channels: int = layer.layer(-1, Resnet).out_channels
            layer.insert(-1, Upsample(channels=channels, upsample_factor=2, device=device, dtype=dtype))
        super().__init__(
            Conv2d(in_channels=self.latent_dim, out_channels=self.latent_dim, kernel_size=1, device=device, dtype=dtype),
            Conv2d(in_channels=self.latent_dim, out_channels=resnet_sizes[0], kernel_size=3, padding=1, device=device, dtype=dtype),
            Chain(*resnet_layers),
            Chain(
                GroupNorm(channels=resnet_sizes[-1], num_groups=32, eps=1e-6, device=device, dtype=dtype),
                SiLU(),
                Conv2d(in_channels=resnet_sizes[-1], out_channels=self.output_channels, kernel_size=3, padding=1, device=device, dtype=dtype),
            ),
        )


class FixedGroupNorm(fl.Chain, Adapter[fl.GroupNorm]):
    """GroupNorm with statistics frozen from the first pass — keeps tiled
    inference consistent across tiles (auto_encoder.py:209)."""

    def __init__(self, target: fl.GroupNorm) -> None:
        self.mean: jax.Array | None = None
        self.var: jax.Array | None = None
        with self.setup_adapter(target):
            super().__init__(fl.Lambda(self.compute_group_norm))

    def compute_group_norm(self, x: jax.Array) -> jax.Array:
        b = x.shape[0]
        spatial = x.shape[1:-1]
        g = self.target.num_groups
        cg = self.target.channels // g
        xg = x.reshape(b, *spatial, g, cg).astype(jnp.float32)
        axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)  # spatial + in-group channels

        if self.mean is None or self.var is None:
            self.mean = jnp.mean(xg, axis=axes, keepdims=True)
            self.var = jnp.var(xg, axis=axes, keepdims=True)

        y = (xg - self.mean) * jax.lax.rsqrt(self.var + self.target.eps)
        y = y.reshape(x.shape)
        w = self.target.weight.astype(jnp.float32)
        bia = self.target.bias.astype(jnp.float32)
        return (y * w + bia).astype(x.dtype)


def _create_blending_mask(
    size: _ImageSize,
    blending: int,
    num_channels: int,
    is_edge: tuple[bool, bool, bool, bool] = (False, False, False, False),
) -> jax.Array:
    """Linear-ramp blending mask, NHWC (auto_encoder.py:253-280)."""
    mask = jnp.ones((size.height, size.width), dtype=jnp.float32)
    if blending == 0:
        return mask[None, :, :, None]
    blending = min(blending, min(size) // 2)
    ramp = jnp.linspace(0, 1, blending)
    if not is_edge[0]:  # top
        mask = mask.at[:blending, :].mul(ramp[:, None])
    if not is_edge[1]:  # bottom
        mask = mask.at[-blending:, :].mul(ramp[::-1][:, None])
    if not is_edge[2]:  # left
        mask = mask.at[:, :blending].mul(ramp[None, :])
    if not is_edge[3]:  # right
        mask = mask.at[:, -blending:].mul(ramp[::-1][None, :])
    return jnp.broadcast_to(mask[None, :, :, None], (1, size.height, size.width, num_channels))


class LatentDiffusionAutoencoder(Chain):
    """VAE facade with scale + (tiled) image↔latent helpers (auto_encoder.py:282)."""

    encoder_scale = 0.18125

    _pytree_ignore = Chain._pytree_ignore | {"_tile_size", "_blending"}

    def __init__(self, device: Any = None, dtype: Any = None) -> None:
        super().__init__(
            Encoder(device=device, dtype=dtype),
            Decoder(device=device, dtype=dtype),
        )
        self._tile_size: _ImageSize | None = None
        self._blending: int | None = None

    def _post_unflatten(self) -> None:
        super()._post_unflatten()
        self._tile_size = None
        self._blending = None

    def encode(self, x: jax.Array) -> jax.Array:
        encoder = self[0]
        return self.encoder_scale * encoder(x)

    def decode(self, x: jax.Array) -> jax.Array:
        decoder = self[1]
        return decoder(x / self.encoder_scale)

    # -- image helpers -------------------------------------------------------

    def image_to_latents(self, image: Image.Image) -> jax.Array:
        return self.images_to_latents([image])

    def images_to_latents(self, images: list[Image.Image]) -> jax.Array:
        x = images_to_tensor(images, dtype=self.dtype)
        return self.encode(2 * x - 1)

    def latents_to_image(self, x: jax.Array) -> Image.Image:
        if x.shape[0] != 1:
            raise ValueError(f"Expected batch size of 1, got {x.shape[0]}")
        return self.latents_to_images(x)[0]

    def latents_to_images(self, x: jax.Array) -> list[Image.Image]:
        return tensor_to_images((self.decode(x) + 1) / 2)

    # -- tiled inference (auto_encoder.py:412-640) ---------------------------

    def tiled_image_to_latents(self, image: Image.Image) -> jax.Array:
        if self._tile_size is None:
            raise ValueError("Tiled inference context manager not active. Use `tiled_inference` method to activate.")
        assert self._blending is not None
        image_tensor = image_to_tensor(image, dtype=self.dtype)
        return self._tiled_encode(2 * image_tensor - 1, self._tile_size, self._blending)

    def tiled_latents_to_image(self, x: jax.Array) -> Image.Image:
        if self._tile_size is None:
            raise ValueError("Tiled inference context manager not active. Use `tiled_inference` method to activate.")
        assert self._blending is not None
        result = self._tiled_decode(x, self._tile_size, self._blending)
        return tensor_to_image((result + 1) / 2)

    @staticmethod
    def _generate_latent_tiles(size: _ImageSize, tile_size: _ImageSize, overlap: int = 8) -> list[_Tile]:
        tiles: list[_Tile] = []
        for x in range(0, max(size.width - overlap, 1), tile_size.width - overlap):
            for y in range(0, max(size.height - overlap, 1), tile_size.height - overlap):
                tiles.append(
                    _Tile(
                        top=max(0, y),
                        left=max(0, x),
                        bottom=min(size.height, y + tile_size.height),
                        right=min(size.width, x + tile_size.width),
                    )
                )
        return tiles

    def _add_fixed_group_norm(self, image: Image.Image, inference_size: _ImageSize) -> None:
        """Freeze GN statistics from a downscaled full-image pass (auto_encoder.py:430)."""
        for group_norm, parent in self.walk(fl.GroupNorm):
            FixedGroupNorm(group_norm).inject(parent)

        downscaled_image = image.resize((inference_size.width, inference_size.height))
        image_tensor = image_to_tensor(image, dtype=self.dtype)
        small = image_to_tensor(downscaled_image, dtype=self.dtype)
        small = jnp.clip(small, jnp.min(image_tensor), jnp.max(image_tensor))

        axes = (0, 1, 2)  # per-channel stats over batch+space (NHWC)
        mean = jnp.mean(image_tensor, axis=axes, keepdims=True)
        std = jnp.std(image_tensor, axis=axes, keepdims=True)
        new_mean = jnp.mean(small, axis=axes, keepdims=True)
        new_std = jnp.std(small, axis=axes, keepdims=True)
        small = (small - new_mean) * (std / new_std) + mean

        latents = self.encode(2 * small - 1)
        self.decode(latents)

    def _remove_fixed_group_norm(self) -> None:
        for fixed_group_norm in list(self.layers(FixedGroupNorm, recurse=True)):
            fixed_group_norm.eject()

    def _tiled_encode(self, image_tensor: jax.Array, tile_size: _ImageSize, blending: int = 64) -> jax.Array:
        latent_size = _ImageSize(height=image_tensor.shape[1] // 8, width=image_tensor.shape[2] // 8)
        target_tile = _ImageSize(height=tile_size.height // 8, width=tile_size.width // 8)
        tiles = self._generate_latent_tiles(latent_size, tile_size=target_tile, overlap=blending // 8)
        if len(tiles) == 1:
            return self.encode(image_tensor)

        result = jnp.zeros((1, latent_size.height, latent_size.width, 4), dtype=jnp.float32)
        weights = jnp.zeros_like(result)
        for t in tiles:
            pixel_tile = image_tensor[:, t.top * 8 : t.bottom * 8, t.left * 8 : t.right * 8, :]
            encoded = self.encode(pixel_tile).astype(jnp.float32)
            is_edge = (t.top == 0, t.bottom == latent_size.height, t.left == 0, t.right == latent_size.width)
            mask = _create_blending_mask(
                _ImageSize(height=t.bottom - t.top, width=t.right - t.left), blending // 8, 4, is_edge
            )
            result = result.at[:, t.top : t.bottom, t.left : t.right, :].add(encoded * mask)
            weights = weights.at[:, t.top : t.bottom, t.left : t.right, :].add(mask)
        return (result / weights).astype(image_tensor.dtype)

    def _tiled_decode(self, latents: jax.Array, tile_size: _ImageSize, blending: int = 64) -> jax.Array:
        latent_size = _ImageSize(height=latents.shape[1], width=latents.shape[2])
        pixel_size = _ImageSize(height=latent_size.height * 8, width=latent_size.width * 8)
        target_tile = _ImageSize(height=tile_size.height // 8, width=tile_size.width // 8)
        tiles = self._generate_latent_tiles(latent_size, tile_size=target_tile, overlap=blending // 8)
        if len(tiles) == 1:
            return self.decode(latents)

        result = jnp.zeros((1, pixel_size.height, pixel_size.width, 3), dtype=jnp.float32)
        weights = jnp.zeros_like(result)
        for t in tiles:
            decoded = self.decode(latents[:, t.top : t.bottom, t.left : t.right, :]).astype(jnp.float32)
            is_edge = (t.top == 0, t.bottom == latent_size.height, t.left == 0, t.right == latent_size.width)
            pixel_tile_size = _ImageSize(height=(t.bottom - t.top) * 8, width=(t.right - t.left) * 8)
            mask = _create_blending_mask(pixel_tile_size, blending, 3, is_edge)
            result = result.at[:, t.top * 8 : t.bottom * 8, t.left * 8 : t.right * 8, :].add(decoded * mask)
            weights = weights.at[:, t.top * 8 : t.bottom * 8, t.left * 8 : t.right * 8, :].add(mask)
        return (result / weights).astype(latents.dtype)

    @contextmanager
    def tiled_inference(
        self, image: Image.Image, tile_size: tuple[int, int] = (512, 512), blending: int = 64
    ) -> Generator[None, None, None]:
        """Freeze GN stats + enable tiled image↔latent methods (auto_encoder.py:593)."""
        try:
            self._blending = blending
            self._tile_size = _ImageSize(width=tile_size[0], height=tile_size[1])
            self._add_fixed_group_norm(image, inference_size=self._tile_size)
            yield
        finally:
            self._remove_fixed_group_norm()
            self._tile_size = None
            self._blending = None
