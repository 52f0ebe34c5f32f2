"""Self-Attention Guidance (SAG, arXiv:2210.00939) — shared machinery.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/self_attention_guidance.py
(SelfAttentionMap :22, SelfAttentionShape :50, SAGAdapter :62). NHWC.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING, Any, Generic, TypeVar

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.adapters.adapter import Adapter
from refiners_tpu.fluxion.context import Contexts
from refiners_tpu.fluxion.utils import gaussian_blur, interpolate
from refiners_tpu.foundationals.latent_diffusion.solvers import Solver

if TYPE_CHECKING:
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.unet import SD1UNet
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLUNet

T = TypeVar("T", bound="SD1UNet | SDXLUNet")
TSAGAdapter = TypeVar("TSAGAdapter", bound="SAGAdapter[Any]")


class SelfAttentionMap(fl.Passthrough):
    """Capture softmax(QK^T/√d) of the middle-block self-attention."""

    def __init__(self, num_heads: int, context_key: str) -> None:
        self.num_heads = num_heads
        self.context_key = context_key
        super().__init__(
            fl.Lambda(func=self.compute_attention_scores),
            fl.SetContext(context="self_attention_map", key=context_key),
        )

    def split_to_multi_head(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 3, f"Expected (batch, seq, embedding), got {x.shape}"
        assert x.shape[-1] % self.num_heads == 0
        return x.reshape(x.shape[0], x.shape[1], self.num_heads, x.shape[-1] // self.num_heads).transpose(0, 2, 1, 3)

    def compute_attention_scores(self, query: jax.Array, key: jax.Array, value: jax.Array) -> jax.Array:
        q, k = self.split_to_multi_head(query), self.split_to_multi_head(key)
        dim = q.shape[-1]
        attention = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) / math.sqrt(dim)
        return jax.nn.softmax(attention, axis=-1).astype(query.dtype)


class SelfAttentionShape(fl.Passthrough):
    """Record the NHWC spatial shape of the middle-block features."""

    def __init__(self, context_key: str) -> None:
        self.context_key = context_key
        super().__init__(
            fl.SetContext(context="self_attention_map", key=context_key, callback=self.register_shape),
        )

    def register_shape(self, shapes: list[tuple[int, int]], x: jax.Array) -> None:
        assert x.ndim == 4, f"Expected 4D tensor, got {x.ndim}D with shape {x.shape}"
        shapes.append(x.shape[1:3])


class SAGAdapter(Generic[T], fl.Chain, Adapter[T]):
    """Blur-degrade latents where the attention mass concentrates (SAG)."""

    def __init__(self, target: T, scale: float = 1.0, kernel_size: int = 9, sigma: float = 1.0) -> None:
        self.scale = scale
        self.kernel_size = kernel_size
        self.sigma = sigma
        with self.setup_adapter(target):
            super().__init__(target)

    def compute_sag_mask(self, latents: jax.Array, classifier_free_guidance: bool = True) -> jax.Array:
        attn_map = self.use_context("self_attention_map")["middle_block_attn_map"]
        if classifier_free_guidance:
            attn_map, _ = jnp.split(attn_map, 2, axis=0)
        attn_shape = self.use_context("self_attention_map")["middle_block_attn_shape"].pop()
        assert len(attn_shape) == 2
        b, h, w, c = latents.shape
        attn_h, attn_w = attn_shape
        # tokens whose received attention mass exceeds 1: mean over heads, sum over queries
        attn_mask = jnp.mean(attn_map, axis=1).sum(axis=1) > 1.0
        attn_mask = attn_mask.reshape(b, attn_h, attn_w, 1).astype(attn_map.dtype)
        attn_mask = jnp.tile(attn_mask, (1, 1, 1, c))
        return interpolate(attn_mask, (h, w))

    def compute_degraded_latents(
        self,
        solver: Solver,
        latents: jax.Array,
        noise: jax.Array,
        step: int | jax.Array,
        classifier_free_guidance: bool = True,
    ) -> jax.Array:
        sag_mask = self.compute_sag_mask(latents=latents, classifier_free_guidance=classifier_free_guidance)
        original_latents = solver.remove_noise(x=latents, noise=noise, step=step)
        degraded_latents = gaussian_blur(original_latents, kernel_size=self.kernel_size, sigma=self.sigma)
        degraded_latents = degraded_latents * sag_mask + original_latents * (1 - sag_mask)
        return solver.add_noise(degraded_latents, noise=noise, step=step)

    def init_context(self) -> Contexts:
        return {"self_attention_map": {"middle_block_attn_map": None, "middle_block_attn_shape": []}}
