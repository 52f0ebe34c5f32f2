"""SAM ViT image encoder (arXiv:2304.02643).

Reference: /root/reference/src/refiners/foundationals/segment_anything/image_encoder.py
(RelativePositionAttention :58, WindowPartition/Merge :200/:220, SAMViT :317,
SAMViTH :359). NHWC throughout (the reference already runs this ViT
channels-last); the decomposed relative-position attention is expressed as
einsums that XLA fuses onto the MXU, and window partitioning is a static
reshape/transpose (shapes are fixed at 1024² → 64×64 patches).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.context import Contexts
from refiners_tpu.fluxion.utils import pad


class PatchEncoder(fl.Chain):
    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        patch_size: int = 16,
        use_bias: bool = True,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.patch_size = patch_size
        self.use_bias = use_bias
        super().__init__(
            fl.Conv2d(
                in_channels=in_channels,
                out_channels=out_channels,
                kernel_size=(patch_size, patch_size),
                stride=(patch_size, patch_size),
                use_bias=use_bias,
                device=device,
                dtype=dtype,
            ),
        )


class PositionalEncoder(fl.Residual):
    def __init__(
        self,
        embedding_dim: int,
        image_embedding_size: tuple[int, int],
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.embedding_dim = embedding_dim
        self.image_embedding_size = image_embedding_size
        super().__init__(
            fl.Parameter(
                image_embedding_size[0], image_embedding_size[1], embedding_dim, device=device, dtype=dtype
            ),
        )


class RelativePositionAttention(fl.WeightedModule):
    """Fused-qkv attention with decomposed relative positions (image_encoder.py:58)."""

    def __init__(
        self,
        embedding_dim: int,
        num_heads: int,
        spatial_size: tuple[int, int],
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__()
        self.embedding_dim = embedding_dim
        self.num_heads = num_heads
        self.head_dim = embedding_dim // num_heads
        self.spatial_size = spatial_size
        dtype = dtype or jnp.float32
        self.horizontal_embedding = jnp.zeros((2 * spatial_size[0] - 1, self.head_dim), dtype=dtype)
        self.vertical_embedding = jnp.zeros((2 * spatial_size[1] - 1, self.head_dim), dtype=dtype)

    @property
    def weight(self) -> jax.Array:  # type: ignore[override]
        return self.horizontal_embedding

    def forward(self, x: jax.Array) -> jax.Array:
        batch, height, width, _ = x.shape
        bh = batch * self.num_heads
        seq = width * height
        qkv = x.reshape(batch, seq, 3, self.num_heads, self.head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, bh, seq, self.head_dim)
        query, key, value = qkv[0], qkv[1], qkv[2]

        h_rel, v_rel = self.compute_relative_embedding(query)

        from refiners_tpu.ops.attention import flash_auto_relpos
        from refiners_tpu.ops.flash_attention import flash_attention_relpos

        if flash_auto_relpos(query):
            # long (global-attention) layers ride the Pallas flash kernel with
            # the DECOMPOSED rel-pos bias rebuilt on-chip per tile: the
            # materialized (heads, L, L) f32 bias is ~1 GB per SAM-H global
            # layer and measured ~8 ms/layer of broadcast+reshape plus a
            # bias-read-bound kernel — the decomposed operands are 33 MB
            out = flash_attention_relpos(
                query.reshape(batch, self.num_heads, seq, self.head_dim),
                key.reshape(batch, self.num_heads, seq, self.head_dim),
                value.reshape(batch, self.num_heads, seq, self.head_dim),
                v_rel=v_rel[..., 0].reshape(batch, self.num_heads, seq, -1),
                h_rel=h_rel[..., 0, :].reshape(batch, self.num_heads, seq, -1),
                scale=self.head_dim**-0.5,
            ).reshape(bh, seq, self.head_dim)
        else:
            logits = jnp.einsum(
                "bqd,bkd->bqk", query * self.head_dim**-0.5, key, preferred_element_type=jnp.float32
            )
            # order of additions matters for bit-parity with the reference
            logits = (
                logits.reshape(-1, height, width, height, width) + v_rel.astype(jnp.float32)
            ) + h_rel.astype(jnp.float32)
            logits = logits.reshape(bh, seq, seq)
            weights = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            out = jnp.einsum("bqk,bkd->bqd", weights, value, preferred_element_type=x.dtype)
        out = out.reshape(batch, self.num_heads, height, width, self.head_dim)
        return out.transpose(0, 2, 3, 1, 4).reshape(batch, height, width, -1)

    def compute_relative_coords(self, size: int) -> jax.Array:
        r = jnp.arange(size)
        return r[:, None] - r[None, :] + size - 1

    def compute_relative_embedding(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        width, height = self.spatial_size
        horizontal = self.horizontal_embedding[self.compute_relative_coords(width)]
        vertical = self.vertical_embedding[self.compute_relative_coords(height)]
        xg = x.reshape(x.shape[0], width, height, -1)
        h_rel = jnp.einsum("bhwc,wkc->bhwk", xg, horizontal)[..., None, :]
        v_rel = jnp.einsum("bhwc,hkc->bhwk", xg, vertical)[..., None]
        return h_rel, v_rel


class FusedSelfAttention(fl.Chain):
    """qkv in one matmul, rel-pos attention, output proj (image_encoder.py:130)."""

    def __init__(
        self,
        embedding_dim: int = 768,
        spatial_size: tuple[int, int] = (64, 64),
        num_heads: int = 1,
        use_bias: bool = True,
        is_causal: bool = False,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        assert embedding_dim % num_heads == 0, f"Embedding dim {embedding_dim} not divisible by {num_heads} heads"
        self.embedding_dim = embedding_dim
        self.num_heads = num_heads
        self.use_bias = use_bias
        self.is_causal = is_causal
        super().__init__(
            fl.Linear(
                in_features=embedding_dim, out_features=3 * embedding_dim, bias=use_bias, device=device, dtype=dtype
            ),
            RelativePositionAttention(
                embedding_dim=embedding_dim, num_heads=num_heads, spatial_size=spatial_size, device=device, dtype=dtype
            ),
            fl.Linear(in_features=embedding_dim, out_features=embedding_dim, bias=True, device=device, dtype=dtype),
        )


class FeedForward(fl.Chain):
    def __init__(self, embedding_dim: int, feedforward_dim: int, device: Any = None, dtype: Any = None) -> None:
        self.embedding_dim = embedding_dim
        self.feedforward_dim = feedforward_dim
        super().__init__(
            fl.Linear(in_features=embedding_dim, out_features=feedforward_dim, bias=True, device=device, dtype=dtype),
            fl.GeLU(),
            fl.Linear(in_features=feedforward_dim, out_features=embedding_dim, bias=True, device=device, dtype=dtype),
        )


class WindowPartition(fl.ContextModule):
    """(B, H, W, C) → (B·nw, ws, ws, C) with pad bookkeeping (image_encoder.py:200)."""

    def forward(self, x: jax.Array) -> jax.Array:
        batch, height, width, channels = x.shape
        context = self.use_context("window_partition")
        context.update({"original_height": height, "original_width": width})
        window_size = context["window_size"]
        padding_height = (window_size - height % window_size) % window_size
        padding_width = (window_size - width % window_size) % window_size
        if padding_height > 0 or padding_width > 0:
            x = pad(x, (0, 0, 0, padding_width, 0, padding_height))
        padded_height, padded_width = height + padding_height, width + padding_width
        context.update({"padded_height": padded_height, "padded_width": padded_width})
        x = x.reshape(
            batch, padded_height // window_size, window_size, padded_width // window_size, window_size, channels
        )
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, channels)


class WindowMerge(fl.ContextModule):
    def forward(self, x: jax.Array) -> jax.Array:
        context = self.use_context("window_partition")
        window_size = context["window_size"]
        padded_height, padded_width = context["padded_height"], context["padded_width"]
        original_height, original_width = context["original_height"], context["original_width"]
        batch_size = x.shape[0] // (padded_height * padded_width // window_size // window_size)
        x = x.reshape(
            batch_size, padded_height // window_size, padded_width // window_size, window_size, window_size, -1
        )
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(batch_size, padded_height, padded_width, -1)
        if padded_height > original_height or padded_width > original_width:
            x = x[:, :original_height, :original_width, :]
        return x


class TransformerLayer(fl.Chain):
    def __init__(
        self,
        embedding_dim: int,
        num_heads: int,
        feedforward_dim: int,
        image_embedding_size: tuple[int, int],
        window_size: int | None = None,
        layer_norm_eps: float = 1e-6,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.embedding_dim = embedding_dim
        self.num_heads = num_heads
        self.feedforward_dim = feedforward_dim
        self.window_size = window_size
        self.layer_norm_eps = layer_norm_eps
        self.image_embedding_size = image_embedding_size
        attention_spatial_size = (window_size, window_size) if window_size is not None else image_embedding_size
        reshape_or_merge = (
            WindowMerge()
            if self.window_size is not None
            else fl.Reshape(image_embedding_size[0], image_embedding_size[1], embedding_dim)
        )
        super().__init__(
            fl.Residual(
                fl.LayerNorm(normalized_shape=embedding_dim, eps=layer_norm_eps, device=device, dtype=dtype),
                WindowPartition() if self.window_size is not None else fl.Identity(),
                FusedSelfAttention(
                    embedding_dim=embedding_dim,
                    num_heads=num_heads,
                    spatial_size=attention_spatial_size,
                    device=device,
                    dtype=dtype,
                ),
                reshape_or_merge,
            ),
            fl.Residual(
                fl.LayerNorm(normalized_shape=embedding_dim, eps=layer_norm_eps, device=device, dtype=dtype),
                FeedForward(embedding_dim=embedding_dim, feedforward_dim=feedforward_dim, device=device, dtype=dtype),
            ),
        )

    def init_context(self) -> Contexts:
        return {"window_partition": {"window_size": self.window_size}}


class Neck(fl.Chain):
    """2 convs + LayerNorm2d, NHWC so no permutes (image_encoder.py:286)."""

    def __init__(self, in_channels: int = 768, device: Any = None, dtype: Any = None) -> None:
        self.in_channels = in_channels
        super().__init__(
            fl.Conv2d(in_channels=in_channels, out_channels=256, kernel_size=1, use_bias=False, device=device, dtype=dtype),
            fl.LayerNorm2d(channels=256, device=device, dtype=dtype),
            fl.Conv2d(in_channels=256, out_channels=256, kernel_size=3, padding=1, use_bias=False, device=device, dtype=dtype),
            fl.LayerNorm2d(channels=256, device=device, dtype=dtype),
        )


class Transformer(fl.Chain):
    pass


class SAMViT(fl.Chain):
    """1024², patch 16, window 14, global attention at chosen layers (image_encoder.py:317)."""

    def __init__(
        self,
        embedding_dim: int,
        num_layers: int,
        num_heads: int,
        global_attention_indices: tuple[int, ...] | None = None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.embedding_dim = embedding_dim
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.image_size = (1024, 1024)
        self.patch_size = 16
        self.window_size = 14
        self.image_embedding_size = (self.image_size[0] // self.patch_size, self.image_size[1] // self.patch_size)
        self.feed_forward_dim = 4 * self.embedding_dim
        self.global_attention_indices = global_attention_indices or tuple()
        super().__init__(
            PatchEncoder(
                in_channels=3, out_channels=embedding_dim, patch_size=self.patch_size, device=device, dtype=dtype
            ),
            PositionalEncoder(
                embedding_dim=embedding_dim, image_embedding_size=self.image_embedding_size, device=device, dtype=dtype
            ),
            Transformer(
                TransformerLayer(
                    embedding_dim=embedding_dim,
                    num_heads=num_heads,
                    feedforward_dim=self.feed_forward_dim,
                    window_size=self.window_size if i not in self.global_attention_indices else None,
                    image_embedding_size=self.image_embedding_size,
                    device=device,
                    dtype=dtype,
                )
                for i in range(num_layers)
            ),
            Neck(in_channels=embedding_dim, device=device, dtype=dtype),
        )


class SAMViTH(SAMViT):
    """ViT-H: 1280-dim, 32 layers, global attention at (7, 15, 23, 31)."""

    def __init__(self, device: Any = None, dtype: Any = None) -> None:
        super().__init__(
            embedding_dim=1280,
            num_layers=32,
            num_heads=16,
            global_attention_indices=(7, 15, 23, 31),
            device=device,
            dtype=dtype,
        )
