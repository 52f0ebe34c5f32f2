"""SDXL T2I-Adapter.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/stable_diffusion_xl/t2i_adapter.py:9.
"""

from __future__ import annotations

import jax

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import MiddleBlock, SDXLUNet
from refiners_tpu.foundationals.latent_diffusion.t2i_adapter import ConditionEncoderXL, T2IAdapter, T2IFeatures
from refiners_tpu.foundationals.latent_diffusion.unet import ResidualAccumulator


class SDXLT2IAdapter(T2IAdapter[SDXLUNet]):
    def __init__(
        self,
        target: SDXLUNet,
        name: str,
        condition_encoder: ConditionEncoderXL | None = None,
        scale: float = 1.0,
        weights: dict[str, jax.Array] | None = None,
    ) -> None:
        # the UNet middle block is handled separately (see inject/eject)
        self.residual_indices = (3, 5, 8)
        self._features = [T2IFeatures(name=name, index=i, scale=scale) for i in range(4)]
        super().__init__(
            target=target,
            name=name,
            condition_encoder=condition_encoder or ConditionEncoderXL(dtype=target.dtype),
            weights=weights,
        )

    def inject(self: "SDXLT2IAdapter", parent: fl.Chain | None = None) -> "SDXLT2IAdapter":
        def sanity_check_t2i(block: fl.Chain) -> None:
            for t2i_layer in block.layers(layer_type=T2IFeatures):
                assert t2i_layer.name != self.name, f"T2I-Adapter named {self.name} is already injected"

        # strict=False: residual_indices is shorter than _features (middle block)
        for n, feat in zip(self.residual_indices, self._features, strict=False):
            block = self.target.layer(("DownBlocks", n), fl.Chain)
            sanity_check_t2i(block)
            block.insert_before_type(ResidualAccumulator, feat)

        mid_block = self.target.layer("MiddleBlock", MiddleBlock)
        sanity_check_t2i(mid_block)
        mid_block.append(self._features[-1])
        return super().inject(parent)

    def eject(self: "SDXLT2IAdapter") -> None:
        for n, feat in zip(self.residual_indices, self._features, strict=False):
            self.target.layer(("DownBlocks", n), fl.Chain).remove(feat)
        self.target.layer("MiddleBlock", MiddleBlock).remove(self._features[-1])
        super().eject()
