"""ELLA (arXiv:2403.05135): LLM text embedding + timestep-aware resampler.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/ella_adapter.py
(ELLA :212, ELLACrossAttentionAdapter :249, ELLAAdapter :256).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Generic, TypeVar

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.adapters.adapter import Adapter
from refiners_tpu.fluxion.context import Contexts
from refiners_tpu.fluxion.rng import init_normal
from refiners_tpu.foundationals.latent_diffusion.cross_attention import CrossAttentionBlock
from refiners_tpu.foundationals.latent_diffusion.range_adapter import RangeEncoder

if TYPE_CHECKING:
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.unet import SD1UNet
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLUNet

T = TypeVar("T", bound="SD1UNet | SDXLUNet")
TELLAAdapter = TypeVar("TELLAAdapter", bound="ELLAAdapter[Any]")


class LayerNormNoAffine(fl.Module):
    def __init__(self, normalized_shape: int, eps: float = 1e-5, device: Any = None, dtype: Any = None) -> None:
        super().__init__()
        self.normalized_shape = normalized_shape
        self.eps = eps

    def forward(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class TimestepEncoder(fl.Passthrough):
    def __init__(self, time_embedding_dim: int, time_channel: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__(
            fl.UseContext("diffusion", "timestep"),
            RangeEncoder(time_channel, time_embedding_dim, device=device, dtype=dtype),
            fl.SetContext("ella", "timestep_embedding"),
        )


class SquaredReLU(fl.ReLU):
    def forward(self, x: jax.Array) -> jax.Array:
        return super().forward(x) ** 2


class AdaLayerNorm(fl.Chain):
    """LayerNorm modulated by the timestep embedding (ella_adapter.py:55)."""

    def __init__(self, embedding_dim: int, time_embedding_dim: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__(
            fl.Parallel(
                LayerNormNoAffine(embedding_dim, eps=1e-6, device=device, dtype=dtype),
                fl.Chain(
                    fl.UseContext("ella", "timestep_embedding"),
                    fl.SiLU(),
                    fl.Linear(time_embedding_dim, embedding_dim * 2, device=device, dtype=dtype),
                ),
            ),
            fl.Lambda(self._scale_shift_tensors),
        )
        linear = self.ensure_find(fl.Linear)
        linear.weight = jnp.zeros_like(linear.weight)
        linear.bias = jnp.zeros_like(linear.bias)

    def _scale_shift_tensors(self, x: jax.Array, time_embedding: jax.Array) -> jax.Array:
        shift, scale = jnp.split(time_embedding, 2, axis=-1)
        return x * (1 + scale) + shift


class ParameterInitialized(fl.Parameter):
    def __init__(self, *dims: int, requires_grad: bool = True, device: Any = None, dtype: Any = None) -> None:
        super().__init__(*dims, requires_grad=requires_grad, device=device, dtype=dtype)
        self.weight = init_normal(dims, std=dims[1] ** 0.5, dtype=self.weight.dtype)


class Latents(fl.Chain):
    def __init__(self, num_latents: int, width: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__(ParameterInitialized(num_latents, width, device=device, dtype=dtype))


class PerceiverAttention(fl.Chain):
    def __init__(
        self, width: int, num_heads: int, timestep_embedding_dim: int, device: Any = None, dtype: Any = None
    ) -> None:
        super().__init__(
            fl.Distribute(
                AdaLayerNorm(width, timestep_embedding_dim, device=device, dtype=dtype),
                AdaLayerNorm(width, timestep_embedding_dim, device=device, dtype=dtype),
            ),
            fl.Parallel(
                fl.GetArg(index=1),
                fl.Lambda(func=self.to_kv),
                fl.Lambda(func=self.to_kv),
            ),
            fl.Attention(embedding_dim=width, num_heads=num_heads, device=device, dtype=dtype),
        )

    def to_kv(self, x: jax.Array, latents: jax.Array) -> jax.Array:
        return jnp.concatenate((latents, x), axis=-2)


class OutputProjection(fl.Chain):
    def __init__(self, width: int, output_dim: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__(
            fl.Linear(width, output_dim, device=device, dtype=dtype),
            fl.LayerNorm(output_dim, device=device, dtype=dtype),
        )


class Transformer(fl.Chain):
    pass


class TransformerLayer(fl.Chain):
    pass


class FeedForward(fl.Chain):
    def __init__(self, width: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__(
            fl.Linear(width, width * 4, device=device, dtype=dtype),
            SquaredReLU(),
            fl.Linear(width * 4, width, device=device, dtype=dtype),
        )


class PerceiverResampler(fl.Chain):
    def __init__(
        self,
        time_embedding_dim: int,
        width: int,
        num_layers: int,
        num_heads: int,
        num_latents: int,
        output_dim: int | None,
        input_dim: int | None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__(
            fl.Linear(input_dim, width, device=device, dtype=dtype) if input_dim else fl.Identity(),
            fl.SetContext("perceiver_resampler", "x"),
            Latents(num_latents, width, device=device, dtype=dtype),
            fl.Residual(
                fl.UseContext("ella", "timestep_embedding"),
                fl.SiLU(),
                fl.Linear(time_embedding_dim, width, device=device, dtype=dtype),
            ),
            Transformer(
                TransformerLayer(
                    fl.Residual(
                        fl.Parallel(fl.UseContext(context="perceiver_resampler", key="x"), fl.Identity()),
                        PerceiverAttention(width, num_heads, time_embedding_dim, device=device, dtype=dtype),
                    ),
                    fl.Residual(
                        AdaLayerNorm(width, time_embedding_dim, device=device, dtype=dtype),
                        FeedForward(width, device=device, dtype=dtype),
                    ),
                )
                for _ in range(num_layers)
            ),
            OutputProjection(width, output_dim, device=device, dtype=dtype) if output_dim else fl.Identity(),
        )

    def init_context(self) -> Contexts:
        return {"perceiver_resampler": {"x": None}}


class ELLA(fl.Passthrough):
    """ELLA latents encoder (ella_adapter.py:212)."""

    def __init__(
        self,
        time_channel: int,
        timestep_embedding_dim: int,
        width: int,
        num_layers: int,
        num_heads: int,
        num_latents: int,
        input_dim: int | None = None,
        out_dim: int | None = None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__(
            TimestepEncoder(timestep_embedding_dim, time_channel, device=device, dtype=dtype),
            fl.UseContext("adapted_cross_attention_block", "llm_text_embedding"),
            PerceiverResampler(
                timestep_embedding_dim,
                width,
                num_layers,
                num_heads,
                num_latents,
                out_dim,
                input_dim,
                device=device,
                dtype=dtype,
            ),
            fl.SetContext("ella", "latents"),
        )


class ELLACrossAttentionAdapter(fl.Chain, Adapter[fl.UseContext]):
    """Swap a cross-attn text UseContext for the ELLA latents (ella_adapter.py:249)."""

    def __init__(self, target: fl.UseContext) -> None:
        with self.setup_adapter(target):
            super().__init__(fl.UseContext("ella", "latents"))


class ELLAAdapter(Generic[T], fl.Chain, Adapter[T]):
    _pytree_ignore = fl.Chain._pytree_ignore | {"_latents_encoder", "sub_adapters"}

    def __init__(self, target: T, latents_encoder: ELLA, weights: dict[str, jax.Array] | None = None) -> None:
        if weights is not None:
            latents_encoder.load_state_dict(weights)
        self._latents_encoder = [latents_encoder]
        with self.setup_adapter(target):
            super().__init__(target)
        self.sub_adapters = [
            ELLACrossAttentionAdapter(use_context)
            for cross_attn in target.layers(CrossAttentionBlock)
            for use_context in cross_attn.layers(fl.UseContext)
        ]

    def inject(self: TELLAAdapter, parent: fl.Chain | None = None) -> TELLAAdapter:
        for adapter in self.sub_adapters:
            adapter.inject()
        self.target.insert(0, self.latents_encoder)
        return super().inject(parent)

    def eject(self) -> None:
        for adapter in self.sub_adapters:
            adapter.eject()
        self.target.pop(0)
        super().eject()

    @property
    def latents_encoder(self) -> ELLA:
        return self._latents_encoder[0]

    def set_llm_text_embedding(self, text_embedding: jax.Array) -> None:
        self.set_context("adapted_cross_attention_block", {"llm_text_embedding": text_embedding})

    def init_context(self) -> Contexts:
        return {"ella": {"timestep_embedding": None, "latents": None}}
