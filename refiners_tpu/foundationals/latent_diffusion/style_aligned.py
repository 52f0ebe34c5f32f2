"""StyleAligned (arXiv:2312.02133): shared self-attention across a batch.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/style_aligned.py
(ExtractReferenceFeatures :15, AdaIN :58, ScaleReferenceFeatures :104,
StyleAligned :155, SharedSelfAttentionAdapter :227, StyleAlignedAdapter :285).
"""

from __future__ import annotations

from functools import cached_property
from typing import Generic, TypeVar

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.adapters.adapter import Adapter
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.unet import SD1UNet
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLUNet

T = TypeVar("T", bound="SD1UNet | SDXLUNet")


class ExtractReferenceFeatures(fl.Module):
    """First CFG-pair sample, repeated over the batch (style_aligned.py:15)."""

    def forward(self, features: jax.Array) -> jax.Array:
        cfg_batch_size = features.shape[0]
        batch_size = cfg_batch_size // 2
        features_cond, features_uncond = jnp.split(features, 2, axis=0)
        features_ref = jnp.stack((features_cond[0], features_uncond[0]))
        return jnp.repeat(features_ref, batch_size, axis=0)


class AdaIN(fl.Module):
    """Adaptive Instance Normalization of targets onto reference statistics
    (arXiv:1703.06868; style_aligned.py:58)."""

    def __init__(self, epsilon: float = 1e-8) -> None:
        super().__init__()
        self.epsilon = epsilon

    def forward(self, targets: jax.Array, reference: jax.Array) -> tuple[jax.Array, jax.Array]:
        targets_mean = jnp.mean(targets, axis=-2, keepdims=True)
        targets_std = jnp.std(targets, axis=-2, keepdims=True, ddof=1)
        targets_normalized = (targets - targets_mean) / (targets_std + self.epsilon)

        reference_mean = jnp.mean(reference, axis=-2, keepdims=True)
        reference_std = jnp.std(reference, axis=-2, keepdims=True, ddof=1)
        return targets_normalized * reference_std + reference_mean, reference


class ScaleReferenceFeatures(fl.Module):
    """Scale the non-reference part of each CFG half (style_aligned.py:104)."""

    def __init__(self, scale: float = 1.0) -> None:
        super().__init__()
        self.scale = scale

    def forward(self, features: jax.Array) -> jax.Array:
        cfg_batch_size = features.shape[0]
        batch_size = cfg_batch_size // 2
        stacked = features.reshape(2, batch_size, *features.shape[1:])
        stacked = stacked.at[:, 1:].multiply(self.scale)
        return stacked.reshape(features.shape)


class StyleAligned(fl.Chain):
    """AdaIN + reference concat pipeline for one of Q/K/V (style_aligned.py:155)."""

    def __init__(self, adain: bool, concatenate: bool, scale: float = 1.0) -> None:
        super().__init__(
            fl.Parallel(fl.Identity(), ExtractReferenceFeatures()),
            AdaIN(),
            fl.Distribute(fl.Identity(), ScaleReferenceFeatures(scale=scale)),
            fl.Concatenate(fl.GetArg(index=0), fl.GetArg(index=1), dim=-2),
        )
        if not adain:
            self.remove(self.ensure_find(AdaIN))
        if not concatenate:
            self.replace(old_module=self.ensure_find(fl.Concatenate), new_module=fl.GetArg(index=0))

    @property
    def scale(self) -> float:
        return self.ensure_find(ScaleReferenceFeatures).scale

    @scale.setter
    def scale(self, scale: float) -> None:
        self.ensure_find(ScaleReferenceFeatures).scale = scale


class SharedSelfAttentionAdapter(fl.Chain, Adapter[fl.SelfAttention]):
    """Insert per-Q/K/V StyleAligned right after the projections (style_aligned.py:227)."""

    _pytree_ignore = fl.Chain._pytree_ignore | {"_style_aligned_layers"}

    def __init__(self, target: fl.SelfAttention, scale: float = 1.0) -> None:
        with self.setup_adapter(target):
            super().__init__(target)

        self._style_aligned_layers = [
            StyleAligned(adain=True, concatenate=False, scale=scale),  # Query
            StyleAligned(adain=True, concatenate=True, scale=scale),  # Key
            StyleAligned(adain=False, concatenate=True, scale=scale),  # Value
        ]

    @cached_property
    def style_aligned_layers(self) -> fl.Distribute:
        return fl.Distribute(*self._style_aligned_layers)

    def inject(self, parent: fl.Chain | None = None) -> "SharedSelfAttentionAdapter":
        self.target.insert_before_type(
            module_type=fl.ScaledDotProductAttention, new_module=self.style_aligned_layers
        )
        return super().inject(parent)

    def eject(self) -> None:
        self.target.remove(self.style_aligned_layers)
        super().eject()

    @property
    def scale(self) -> float:
        return self.style_aligned_layers.layer(0, StyleAligned).scale

    @scale.setter
    def scale(self, scale: float) -> None:
        for style_aligned_module in self.style_aligned_layers:
            style_aligned_module.scale = scale


class StyleAlignedAdapter(Generic[T], fl.Chain, Adapter[T]):
    """Upgrade every SelfAttention into shared self-attention (style_aligned.py:285)."""

    _pytree_ignore = fl.Chain._pytree_ignore | {"shared_self_attention_adapters"}

    def __init__(self, target: T, scale: float = 1.0) -> None:
        with self.setup_adapter(target):
            super().__init__(target)
        self.shared_self_attention_adapters = tuple(
            SharedSelfAttentionAdapter(target=self_attention, scale=scale)
            for self_attention in self.target.layers(fl.SelfAttention)
        )

    def inject(self, parent: fl.Chain | None = None) -> "StyleAlignedAdapter[T]":
        for adapter in self.shared_self_attention_adapters:
            adapter.inject()
        return super().inject(parent)

    def eject(self) -> None:
        for adapter in self.shared_self_attention_adapters:
            adapter.eject()
        super().eject()

    @property
    def scale(self) -> float:
        return self.shared_self_attention_adapters[0].scale

    @scale.setter
    def scale(self, scale: float) -> None:
        for adapter in self.shared_self_attention_adapters:
            adapter.scale = scale
