"""DINOv2 ViT backbone (arXiv:2010.11929 / 2304.07193).

Reference: /root/reference/src/refiners/foundationals/dinov2/vit.py
(InterpolateEmbedding :56, LayerScale :103, Registers :264, ViT :289).
NHWC: the patch conv already yields channels-last, so patchify is one reshape.
"""

from __future__ import annotations

from math import sqrt
from typing import Any

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.context import Contexts
from refiners_tpu.fluxion.layers.activations import Activation
from refiners_tpu.fluxion.utils import interpolate


class ClassToken(fl.Chain):
    def __init__(self, embedding_dim: int, device: Any = None, dtype: Any = None) -> None:
        self.embedding_dim = embedding_dim
        super().__init__(fl.Parameter(1, embedding_dim, device=device, dtype=dtype))


class PositionalEmbedding(fl.Chain):
    def __init__(
        self, sequence_length: int, embedding_dim: int, patch_size: int, device: Any = None, dtype: Any = None
    ) -> None:
        self.sequence_length = sequence_length
        self.embedding_dim = embedding_dim
        self.patch_size = patch_size
        super().__init__(fl.Parameter(sequence_length, embedding_dim, device=device, dtype=dtype))


class InterpolateEmbedding(fl.Module):
    """Resize positional embeddings to the input's patch grid (vit.py:56)."""

    def __init__(self, mode: str, antialias: bool, patch_size: int) -> None:
        super().__init__()
        self.mode = mode
        self.antialias = antialias
        self.patch_size = patch_size

    def forward(self, x: jax.Array, input: jax.Array) -> jax.Array:
        cls_embed = x[:, :1, :]
        patch_embed = x[:, 1:, :]

        B, N, D = patch_embed.shape
        M = int(sqrt(N))
        # NHWC input: spatial dims are (H, W) = shape[1:3]; the reference
        # reads (W, H) from NCHW shape[2:] — order preserved for parity
        W, H = input.shape[1], input.shape[2]
        w = W // self.patch_size
        h = H // self.patch_size
        assert M * M == N, "The sequence length must be a square number."

        grid = patch_embed.reshape(B, M, M, D)  # already channels-last
        grid = interpolate(grid.astype(jnp.float32), (w, h), mode=self.mode, antialias=self.antialias)
        grid = grid.astype(cls_embed.dtype).reshape(B, -1, D)
        return jnp.concatenate((cls_embed, grid), axis=1)


class LayerScale(fl.WeightedModule):
    """Learnable per-channel scale (vit.py:103)."""

    def __init__(self, embedding_dim: int, init_value: float = 1.0, dtype: Any = None, device: Any = None) -> None:
        super().__init__()
        self.embedding_dim = embedding_dim
        self.weight = jnp.full((embedding_dim,), init_value, dtype=dtype or jnp.float32)

    def forward(self, x: jax.Array) -> jax.Array:
        return x * self.weight.astype(x.dtype)


class FeedForward(fl.Chain):
    def __init__(
        self,
        embedding_dim: int,
        feedforward_dim: int,
        activation: Activation,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.embedding_dim = embedding_dim
        self.feedforward_dim = feedforward_dim
        pre_activation_dim = feedforward_dim * 2 if isinstance(activation, fl.GLU) else feedforward_dim
        super().__init__(
            fl.Linear(in_features=embedding_dim, out_features=pre_activation_dim, device=device, dtype=dtype),
            activation,
            fl.Linear(in_features=feedforward_dim, out_features=embedding_dim, device=device, dtype=dtype),
        )


class PatchEncoder(fl.Chain):
    """NHWC image → (B, P², D) patch tokens; records the input for
    positional-embedding interpolation."""

    def __init__(
        self, in_channels: int, out_channels: int, patch_size: int, device: Any = None, dtype: Any = None
    ) -> None:
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.patch_size = patch_size
        super().__init__(
            fl.SetContext(context="dinov2_vit", key="input"),
            fl.Conv2d(
                in_channels=in_channels,
                out_channels=out_channels,
                kernel_size=patch_size,
                stride=patch_size,
                device=device,
                dtype=dtype,
            ),  # (B,H,W,3) → (B,P,P,D)
            fl.Reshape(-1, out_channels),  # (B,P,P,D) → (B,P²,D)
        )


class TransformerLayer(fl.Chain):
    def __init__(
        self,
        embedding_dim: int,
        num_heads: int,
        norm_eps: float,
        mlp_ratio: int,
        activation: Activation,
        feedforward_dim: int | None = None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.embedding_dim = embedding_dim
        self.num_heads = num_heads
        self.norm_eps = norm_eps
        self.mlp_ratio = mlp_ratio
        self.feedforward_dim = feedforward_dim if feedforward_dim is not None else embedding_dim * mlp_ratio
        super().__init__(
            fl.Residual(
                fl.LayerNorm(normalized_shape=embedding_dim, eps=norm_eps, device=device, dtype=dtype),
                fl.SelfAttention(embedding_dim=embedding_dim, num_heads=num_heads, device=device, dtype=dtype),
                LayerScale(embedding_dim=embedding_dim, device=device, dtype=dtype),
            ),
            fl.Residual(
                fl.LayerNorm(normalized_shape=embedding_dim, eps=norm_eps, device=device, dtype=dtype),
                FeedForward(
                    embedding_dim=embedding_dim,
                    feedforward_dim=self.feedforward_dim,
                    activation=activation,
                    device=device,
                    dtype=dtype,
                ),
                LayerScale(embedding_dim=embedding_dim, device=device, dtype=dtype),
            ),
        )


class Transformer(fl.Chain):
    """Alias for a Chain of TransformerLayer."""


class PositionalEncoder(fl.Residual):
    """Alias for a Residual."""


class Registers(fl.Concatenate):
    """Insert register tokens between CLS token and patches (vit.py:264)."""

    def __init__(self, num_registers: int, embedding_dim: int, device: Any = None, dtype: Any = None) -> None:
        self.num_registers = num_registers
        self.embedding_dim = embedding_dim
        super().__init__(
            fl.Slicing(dim=1, end=1),
            fl.Parameter(num_registers, embedding_dim, device=device, dtype=dtype),
            fl.Slicing(dim=1, start=1),
            dim=1,
        )


class ViT(fl.Chain):
    """Vision Transformer with interpolatable positional embedding (vit.py:289)."""

    def __init__(
        self,
        embedding_dim: int = 768,
        patch_size: int = 16,
        image_size: int = 224,
        num_layers: int = 12,
        num_heads: int = 12,
        norm_eps: float = 1e-6,
        mlp_ratio: int = 4,
        num_registers: int = 0,
        activation: Activation | None = None,
        feedforward_dim: int | None = None,
        interpolate_antialias: bool = False,
        interpolate_mode: str = "bicubic",
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        activation = activation if activation is not None else fl.GeLU()
        num_patches = image_size // patch_size
        self.embedding_dim = embedding_dim
        self.patch_size = patch_size
        self.image_size = image_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.norm_eps = norm_eps
        self.mlp_ratio = mlp_ratio
        self.num_registers = num_registers
        self.feedforward_dim = feedforward_dim

        super().__init__(
            fl.Concatenate(
                ClassToken(embedding_dim=embedding_dim, device=device, dtype=dtype),
                PatchEncoder(
                    in_channels=3, out_channels=embedding_dim, patch_size=patch_size, device=device, dtype=dtype
                ),
                dim=1,
            ),
            PositionalEncoder(
                PositionalEmbedding(
                    sequence_length=num_patches**2 + 1,
                    embedding_dim=embedding_dim,
                    patch_size=patch_size,
                    device=device,
                    dtype=dtype,
                ),
                fl.Chain(
                    fl.Parallel(
                        fl.Identity(),
                        fl.UseContext(context="dinov2_vit", key="input"),
                    ),
                    InterpolateEmbedding(
                        mode=interpolate_mode, antialias=interpolate_antialias, patch_size=patch_size
                    ),
                ),
            ),
            Transformer(
                TransformerLayer(
                    embedding_dim=embedding_dim,
                    feedforward_dim=feedforward_dim,
                    activation=activation,
                    num_heads=num_heads,
                    mlp_ratio=mlp_ratio,
                    norm_eps=norm_eps,
                    device=device,
                    dtype=dtype,
                )
                for _ in range(num_layers)
            ),
            fl.LayerNorm(normalized_shape=embedding_dim, eps=norm_eps, device=device, dtype=dtype),
        )

        if self.num_registers > 0:
            registers = Registers(num_registers=num_registers, embedding_dim=embedding_dim, device=device, dtype=dtype)
            self.insert_before_type(Transformer, registers)

    def init_context(self) -> Contexts:
        return {"dinov2_vit": {"input": None}}
