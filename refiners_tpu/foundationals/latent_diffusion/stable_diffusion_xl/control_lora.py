"""Control-LoRA for SDXL: structural-copied half-UNet sharing base weights,
patched with LoRAs + zero convolutions + a condition encoder.

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/stable_diffusion_xl/control_lora.py
(ConditionEncoder :14, ZeroConvolution :90, ControlLora :144, ControlLoraAdapter :251).
The structural copy shares the base UNet weight arrays — zero extra HBM.
"""

from __future__ import annotations

from typing import Any

import jax

from refiners_tpu.conversion.refiners_compat import convert_refiners_state_dict
from refiners_tpu.fluxion.adapters.adapter import Adapter
from refiners_tpu.fluxion.adapters.lora import Lora, LoraAdapter
from refiners_tpu.fluxion.context import Contexts
from refiners_tpu.fluxion.layers import Chain, Conv2d, Multiply, Passthrough, Residual, SiLU, UseContext
from refiners_tpu.fluxion.layers.module import WeightedModule
from refiners_tpu.foundationals.latent_diffusion.range_adapter import RangeAdapter2d
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLUNet
from refiners_tpu.foundationals.latent_diffusion.unet import ResidualAccumulator, ResidualBlock


class ConditionEncoder(Chain):
    """(B, H, W, 3) condition image → (B, H/8, W/8, 320) latent (control_lora.py:14)."""

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 320,
        intermediate_channels: tuple[int, ...] = (16, 32, 96, 256),
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        super().__init__(
            Chain(
                Conv2d(in_channels=in_channels, out_channels=intermediate_channels[0], kernel_size=3, stride=1, padding=1, device=device, dtype=dtype),
                SiLU(),
            ),
            *(
                Chain(
                    Conv2d(
                        in_channels=intermediate_channels[i],
                        out_channels=intermediate_channels[i],
                        kernel_size=3,
                        padding=1,
                        device=device,
                        dtype=dtype,
                    ),
                    SiLU(),
                    Conv2d(
                        in_channels=intermediate_channels[i],
                        out_channels=intermediate_channels[i + 1],
                        kernel_size=3,
                        stride=2,
                        padding=1,
                        device=device,
                        dtype=dtype,
                    ),
                    SiLU(),
                )
                for i in range(len(intermediate_channels) - 1)
            ),
            Conv2d(in_channels=intermediate_channels[-1], out_channels=out_channels, kernel_size=3, padding=1, device=device, dtype=dtype),
        )


class ZeroConvolution(Passthrough):
    """1×1 conv + scale, accumulated into the target UNet residuals (control_lora.py:90)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        residual_index: int,
        scale: float = 1.0,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self._scale = scale
        super().__init__(
            Conv2d(in_channels=in_channels, out_channels=out_channels, kernel_size=1, device=device, dtype=dtype),
            Multiply(scale=scale),
            ResidualAccumulator(n=residual_index),
        )

    @property
    def scale(self) -> float:
        return self._scale

    @scale.setter
    def scale(self, value: float) -> None:
        self._scale = value
        self.ensure_find(Multiply).scale = value


class ControlLora(Passthrough):
    """Half-UNet clone patched with LoRAs/zero-convs/condition encoder
    (control_lora.py:144; see https://github.com/HighCWu/control-lora-v2)."""

    def __init__(self, name: str, unet: SDXLUNet, scale: float = 1.0, condition_channels: int = 3) -> None:
        self.name = name
        super().__init__(
            timestep_encoder := unet.layer("TimestepEncoder", Chain).structural_copy(),
            downblocks := unet.layer("DownBlocks", Chain).structural_copy(),
            middle_block := unet.layer("MiddleBlock", Chain).structural_copy(),
        )

        # distinct timestep context keys to avoid conflicts with the base UNet
        timestep_encoder.context_key = f"timestep_embedding_control_lora_{name}"
        for range_adapter in self.layers(RangeAdapter2d):
            range_adapter.context_key = f"timestep_embedding_control_lora_{name}"

        first_downblock = downblocks.layer(0, Chain)
        out_channels = first_downblock.layer(0, Conv2d).out_channels
        first_downblock.append(
            Residual(
                UseContext(f"control_lora_{name}", "condition"),
                ConditionEncoder(in_channels=condition_channels, out_channels=out_channels, dtype=unet.dtype),
            )
        )

        # ResidualAccumulators become ZeroConvolutions writing scaled residuals
        for residual_accumulator in list(self.layers(ResidualAccumulator, recurse=True)):
            downblock = self.ensure_find_parent(residual_accumulator)
            first_layer = downblock[0]
            assert hasattr(first_layer, "out_channels"), f"{first_layer} has no out_channels attribute"
            block_channels = first_layer.out_channels
            downblock.replace(
                residual_accumulator,
                ZeroConvolution(
                    scale=scale,
                    residual_index=residual_accumulator.n,
                    in_channels=block_channels,
                    out_channels=block_channels,
                    dtype=unet.dtype,
                ),
            )

        middle_block_channels = middle_block.layer(0, ResidualBlock).out_channels
        middle_block.append(
            ZeroConvolution(
                scale=scale,
                residual_index=len(downblocks),
                in_channels=middle_block_channels,
                out_channels=middle_block_channels,
                dtype=unet.dtype,
            )
        )

    @property
    def scale(self) -> float:
        return self.ensure_find(ZeroConvolution).scale

    @scale.setter
    def scale(self, value: float) -> None:
        for zero_convolution_module in self.layers(ZeroConvolution, recurse=True):
            zero_convolution_module.scale = value


class ControlLoraAdapter(Chain, Adapter[SDXLUNet]):
    """Prepends a ControlLora inside the target SDXLUNet (control_lora.py:251)."""

    _pytree_ignore = Chain._pytree_ignore | {"_control_lora"}

    def __init__(
        self,
        name: str,
        target: SDXLUNet,
        scale: float = 1.0,
        condition_channels: int = 3,
        weights: dict[str, jax.Array] | None = None,
    ) -> None:
        with self.setup_adapter(target):
            self.name = name
            self._control_lora = [
                ControlLora(name=name, unet=target, scale=scale, condition_channels=condition_channels),
            ]
            super().__init__(target)
        if weights:
            self.load_weights(weights)

    @property
    def control_lora(self) -> ControlLora:
        return self._control_lora[0]

    def init_context(self) -> Contexts:
        return {f"control_lora_{self.name}": {"condition": None}}

    def inject(self, parent: Chain | None = None) -> "ControlLoraAdapter":
        self.target.insert(index=0, module=self.control_lora)
        return super().inject(parent)

    def eject(self) -> None:
        self.target.remove(self.control_lora)
        return super().eject()

    def structural_copy(self) -> "ControlLoraAdapter":
        raise RuntimeError("ControlLoraAdapter cannot be copied, eject it first.")

    @property
    def scale(self) -> float:
        return self.control_lora.scale

    @scale.setter
    def scale(self, value: float) -> None:
        self.control_lora.scale = value

    def set_condition(self, condition: jax.Array) -> None:
        self.set_context(context=f"control_lora_{self.name}", value={"condition": condition})

    def load_weights(self, state_dict: dict[str, jax.Array]) -> None:
        """Load refiners-hub-layout weights (torch layouts converted here)."""
        ControlLoraAdapter.load_lora_layers(self.name, state_dict, self.control_lora)
        ControlLoraAdapter.load_zero_convolution_layers(state_dict, self.control_lora)
        ControlLoraAdapter.load_condition_encoder(state_dict, self.control_lora)

    @staticmethod
    def load_lora_layers(name: str, state_dict: dict[str, jax.Array], control_lora: ControlLora) -> None:
        lora_weights = {
            key.removeprefix("ControlLora."): value for key, value in state_dict.items() if "ControlLora" in key
        }
        lora_weights = {f"{key}.weight": value for key, value in lora_weights.items()}
        loras = Lora.from_dict(name, state_dict=lora_weights)

        adapters: list[LoraAdapter] = []
        for key, lora in loras.items():
            target = control_lora.layer(key.split("."), WeightedModule)
            assert lora.is_compatible(target)
            adapters.append(LoraAdapter(target, lora))
        for adapter in adapters:
            adapter.inject(control_lora)

    @staticmethod
    def load_zero_convolution_layers(state_dict: dict[str, jax.Array], control_lora: ControlLora) -> None:
        zero_convolution_layers = list(control_lora.layers(ZeroConvolution, recurse=True))
        for i, zero_convolution_layer in enumerate(zero_convolution_layers):
            sub = {
                key.removeprefix(f"ZeroConvolution_{i+1:02d}."): value
                for key, value in state_dict.items()
                if f"ZeroConvolution_{i+1:02d}" in key
            }
            zero_convolution_layer.load_state_dict(
                convert_refiners_state_dict(sub, zero_convolution_layer, strict=False), strict=False
            )

    @staticmethod
    def load_condition_encoder(state_dict: dict[str, jax.Array], control_lora: ControlLora) -> None:
        condition_encoder_layer = control_lora.ensure_find(ConditionEncoder)
        sub = {
            key.removeprefix("ConditionEncoder."): value
            for key, value in state_dict.items()
            if "ConditionEncoder" in key
        }
        condition_encoder_layer.load_state_dict(
            convert_refiners_state_dict(sub, condition_encoder_layer, strict=False), strict=False
        )

    # -- original stability-ai control-lora format ----------------------------

    @staticmethod
    def sort_original_keys(key: str, /) -> tuple[str, int]:
        """Suffix-score sort for the original checkpoint's lora keys
        (reference conversion/models/controllora_sdxl.py:24)."""
        from refiners_tpu.foundationals.latent_diffusion.lora import SDLoraManager

        if "time_embed" in key:  # time embedding layers come first
            return ("", -2)
        if "label_emb" in key:  # then the label embedding
            return ("", -1)
        if "proj_out" in key:  # proj_out sorts after its transformer blocks
            return (key.removesuffix("proj_out") + "transformer_blocks.99.ff.net.2", 10)
        return SDLoraManager.sort_keys(key)

    def load_original_weights(self, state_dict: dict[str, Any]) -> None:
        """Load an original stability-ai control-lora checkpoint (LDM key
        names: lora `.up`/`.down` pairs, `input_hint_block`, `zero_convs`,
        `middle_block_out`) — reference conversion/models/controllora_sdxl.py:48-160.
        """
        import jax.numpy as jnp

        from refiners_tpu.fluxion.adapters.lora import auto_attach_loras

        control_lora = self.control_lora

        # LoRA layers: sorted then shape-matched onto the half-UNet
        lora_weights = {
            f"{key}.weight": jnp.asarray(value)
            for key, value in state_dict.items()
            if ".up" in key or ".down" in key
        }
        loras = Lora.from_dict(self.name, state_dict=lora_weights)
        loras = {key: loras[key] for key in sorted(loras.keys(), key=ControlLoraAdapter.sort_original_keys)}
        auto_attach_loras(loras, control_lora, exclude=["ZeroConvolution", "ConditionEncoder"])

        # condition encoder: input_hint_block.{0,2,4,...} are the convs
        condition_encoder = control_lora.ensure_find(ConditionEncoder)
        for i, (conv, _) in enumerate(condition_encoder.walk(Conv2d, recurse=True)):
            w = jnp.asarray(state_dict[f"input_hint_block.{2 * i}.weight"])
            conv.weight = jnp.transpose(w, (2, 3, 1, 0))  # OIHW → HWIO
            conv.bias = jnp.asarray(state_dict[f"input_hint_block.{2 * i}.bias"])

        # zero convolutions: zero_convs.{i}.0 taps + middle_block_out.0 last
        zero_convs = [z.ensure_find(Conv2d) for z in control_lora.layers(ZeroConvolution, recurse=True)]
        num_down = sum(1 for key in state_dict if key.startswith("zero_convs")) // 2
        assert len(zero_convs) == num_down + 1, f"{len(zero_convs)} zero convs vs {num_down} down taps + middle"
        for i, conv in enumerate(zero_convs):
            stem = f"zero_convs.{i}.0" if i < num_down else "middle_block_out.0"
            w = jnp.asarray(state_dict[f"{stem}.weight"])
            conv.weight = jnp.transpose(w, (2, 3, 1, 0))
            conv.bias = jnp.asarray(state_dict[f"{stem}.bias"])
