"""SDXL LCM adapter: condition-scale embedding block for LCM-distilled UNets.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/stable_diffusion_xl/lcm.py:47.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.adapters.adapter import Adapter
from refiners_tpu.fluxion.context import Contexts
from refiners_tpu.foundationals.latent_diffusion.range_adapter import RangeEncoder
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLUNet


def compute_sinusoidal_embedding(x: jax.Array, embedding_dim: int) -> jax.Array:
    """[sin | cos] variant with exponent / (half_dim - 1) — LCM convention,
    unlike the RangeAdapter's [cos | sin] with / half_dim (lcm.py:12-29).
    float32-critical."""
    half_dim = embedding_dim // 2
    exponent = -math.log(10000) * jnp.arange(half_dim, dtype=jnp.float32) / (half_dim - 1)
    embedding = x[:, None].astype(jnp.float32) * jnp.exp(exponent)[None]
    out = jnp.concatenate([jnp.sin(embedding), jnp.cos(embedding)], axis=-1)
    assert out.shape == (x.shape[0], embedding_dim)
    return out


class ConditionScaleBlock(fl.Residual):
    def __init__(self, in_channels: int, out_channels: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__(
            fl.UseContext("lcm", "condition_scale_embedding"),
            fl.Converter(),
            fl.Linear(in_features=in_channels, out_features=out_channels, bias=False, device=device, dtype=dtype),
        )


class SDXLLcmAdapter(fl.Chain, Adapter[SDXLUNet]):
    """Adapt SDXLUNet for the LCMSolver; use without CFG (lcm.py:47)."""

    def __init__(
        self,
        target: SDXLUNet,
        condition_scale_embedding_dim: int = 256,
        condition_scale: float = 7.5,
    ) -> None:
        assert condition_scale_embedding_dim % 2 == 0
        self.condition_scale_embedding_dim = condition_scale_embedding_dim
        self.condition_scale = condition_scale
        with self.setup_adapter(target):
            super().__init__(target)

    def init_context(self) -> Contexts:
        return {"lcm": {"condition_scale_embedding": self.sinusoidal_embedding}}

    @property
    def sinusoidal_embedding(self) -> jax.Array:
        return compute_sinusoidal_embedding(
            jnp.asarray([(self.condition_scale - 1) * 1000]),
            embedding_dim=self.condition_scale_embedding_dim,
        )

    def set_condition_scale(self, scale: float) -> None:
        self.condition_scale = scale
        self.set_context("lcm", {"condition_scale_embedding": self.sinusoidal_embedding})

    def inject(self: "SDXLLcmAdapter", parent: fl.Chain | None = None) -> "SDXLLcmAdapter":
        ra = self.target.ensure_find(RangeEncoder)
        block = ConditionScaleBlock(
            in_channels=self.condition_scale_embedding_dim,
            out_channels=ra.sinusoidal_embedding_dim,
            dtype=self.target.dtype,
        )
        ra.insert_before_type(fl.Linear, block)
        return super().inject(parent)

    def eject(self) -> None:
        ra = self.target.ensure_find(RangeEncoder)
        ra.remove(ra.ensure_find(ConditionScaleBlock))
        super().eject()
