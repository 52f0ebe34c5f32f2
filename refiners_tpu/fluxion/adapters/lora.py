"""LoRA adapters.

Reference: /root/reference/src/refiners/fluxion/adapters/lora.py (:14-523).
API preserved (Lora/LinearLora/Conv2dLora/LoraAdapter/auto_attach_loras).

Checkpoint weights arrive in torch layout — Linear (out, in), Conv OIHW —
exactly as found in CivitAI/diffusers state dicts; `load_weights` transposes
into our MXU-friendly layouts ((in, out) and HWIO). Under jit a LoraAdapter
compiles to `x@W + scale·((x@A)@B)`: a fused side-branch, no Python dispatch.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Generic, Iterator, TypeVar, cast

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion import rng
from refiners_tpu.fluxion.adapters.adapter import Adapter

T = TypeVar("T", bound=fl.WeightedModule)


class Lora(Generic[T], fl.Chain, ABC):
    """down → up → Multiply(scale) low-rank branch (lora.py:14)."""

    def __init__(
        self,
        name: str,
        /,
        rank: int = 16,
        scale: float = 1.0,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.name = name
        self._rank = rank
        self._scale = scale
        super().__init__(
            *self.lora_layers(device=device, dtype=dtype),
            fl.Multiply(scale),
        )
        self.reset_parameters()

    def reset_parameters(self) -> None:
        """down ~ N(0, 1/rank); up = 0 (lora.py:57-60)."""
        self.down.weight = (
            jax.random.normal(rng.next_key(), self.down.weight.shape) / self.rank
        ).astype(self.down.weight.dtype)
        self.up.weight = jnp.zeros_like(self.up.weight)

    @abstractmethod
    def lora_layers(self, device: Any = None, dtype: Any = None) -> tuple[T, T]: ...

    @property
    def down(self) -> T:
        down_layer = self[0]
        assert isinstance(down_layer, fl.WeightedModule)
        return cast(T, down_layer)

    @property
    def up(self) -> T:
        up_layer = self[1]
        assert isinstance(up_layer, fl.WeightedModule)
        return cast(T, up_layer)

    @property
    def rank(self) -> int:
        return self._rank

    @property
    def scale(self) -> float:
        return self._scale

    @scale.setter
    def scale(self, value: float) -> None:
        self._scale = value
        self.ensure_find(fl.Multiply).scale = value

    @classmethod
    def from_weights(cls, name: str, /, down: jax.Array, up: jax.Array) -> "Lora[Any]":
        """Build from torch-layout (checkpoint) down/up weights."""
        match (up.ndim, down.ndim):
            case (2, 2):
                return LinearLora.from_weights(name, up=up, down=down)
            case (4, 4):
                return Conv2dLora.from_weights(name, up=up, down=down)
            case _:
                raise ValueError(f"Unsupported weight shapes: up={up.shape}, down={down.shape}")

    @classmethod
    def from_dict(cls, name: str, /, state_dict: dict[str, jax.Array]) -> dict[str, "Lora[Any]"]:
        """Create named LoRA layers from a (down, up)-interleaved state dict (lora.py:118)."""
        state_dict = {k: v for k, v in state_dict.items() if ".weight" in k}
        loras: dict[str, Lora[Any]] = {}
        for down_key, down_tensor, up_tensor in zip(
            list(state_dict.keys())[::2], list(state_dict.values())[::2], list(state_dict.values())[1::2]
        ):
            key = ".".join(down_key.split(".")[:-2])
            loras[key] = cls.from_weights(name, down=down_tensor, up=up_tensor)
        return loras

    @abstractmethod
    def is_compatible(self, layer: fl.WeightedModule, /) -> bool: ...

    @abstractmethod
    def checkpoint_weights(self) -> tuple[jax.Array, jax.Array]:
        """(down, up) back in torch/checkpoint layout — inverse of `load_weights`."""
        ...

    def auto_attach(
        self,
        target: fl.Chain,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
    ) -> "tuple[LoraAdapter, fl.Chain | None] | None":
        """Find a shape-compatible layer in `target` and wrap it (lora.py:136)."""
        for layer, parent in target.walk(self.up.__class__):
            if isinstance(parent, Lora):
                continue

            all_parents: list[fl.Chain] = []
            if include is not None or exclude is not None:
                all_parents = parent.get_parents() + [parent]

            if include is not None and all((p.__class__.__name__ not in include) for p in all_parents):
                continue
            if exclude is not None and any((p.__class__.__name__ in exclude) for p in all_parents):
                continue
            if not self.is_compatible(layer):
                continue

            if isinstance(parent, LoraAdapter):
                if self.name in parent.names:
                    continue
                parent.add_lora(self)
                return parent, None

            return LoraAdapter(layer, self), parent
        return None

    def load_weights(self, down_weight: jax.Array, up_weight: jax.Array) -> None:
        """Load torch-layout weights, transposing into our layouts (lora.py:168)."""
        down, up = self._convert_weights(down_weight, up_weight)
        assert down.shape == self.down.weight.shape, f"{down.shape} != {self.down.weight.shape}"
        assert up.shape == self.up.weight.shape, f"{up.shape} != {self.up.weight.shape}"
        dtype = self.down.weight.dtype
        self.down.weight = down.astype(dtype)
        self.up.weight = up.astype(dtype)

    @staticmethod
    @abstractmethod
    def _convert_weights(down: jax.Array, up: jax.Array) -> tuple[jax.Array, jax.Array]: ...


class LinearLora(Lora[fl.Linear]):
    """LoRA for Linear layers (lora.py:181)."""

    def __init__(
        self,
        name: str,
        /,
        in_features: int,
        out_features: int,
        rank: int = 16,
        scale: float = 1.0,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.in_features = in_features
        self.out_features = out_features
        super().__init__(name, rank=rank, scale=scale, device=device, dtype=dtype)

    @classmethod
    def from_weights(cls, name: str, /, down: jax.Array, up: jax.Array) -> "LinearLora":
        # torch layout: down (rank, in), up (out, rank)
        assert up.ndim == 2 and down.ndim == 2
        assert down.shape[0] == up.shape[1], f"Rank mismatch: down rank={down.shape[0]} and up rank={up.shape[1]}"
        lora = cls(
            name,
            in_features=down.shape[1],
            out_features=up.shape[0],
            rank=down.shape[0],
            dtype=up.dtype,
        )
        lora.load_weights(down_weight=down, up_weight=up)
        return lora

    def lora_layers(self, device: Any = None, dtype: Any = None) -> tuple[fl.Linear, fl.Linear]:
        return (
            fl.Linear(self.in_features, self.rank, bias=False, device=device, dtype=dtype),
            fl.Linear(self.rank, self.out_features, bias=False, device=device, dtype=dtype),
        )

    def is_compatible(self, layer: fl.WeightedModule, /) -> bool:
        return (
            isinstance(layer, fl.Linear)
            and layer.in_features == self.in_features
            and layer.out_features == self.out_features
        )

    @staticmethod
    def _convert_weights(down: jax.Array, up: jax.Array) -> tuple[jax.Array, jax.Array]:
        return jnp.asarray(down).T, jnp.asarray(up).T

    def checkpoint_weights(self) -> tuple[jax.Array, jax.Array]:
        return self.down.weight.T, self.up.weight.T


class Conv2dLora(Lora[fl.Conv2d]):
    """LoRA for Conv2d layers, 1×3/3×1 kernel split (lora.py:269)."""

    def __init__(
        self,
        name: str,
        /,
        in_channels: int,
        out_channels: int,
        rank: int = 16,
        scale: float = 1.0,
        kernel_size: tuple[int, int] = (1, 3),
        stride: tuple[int, int] = (1, 1),
        padding: tuple[int, int] = (0, 1),
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        super().__init__(name, rank=rank, scale=scale, device=device, dtype=dtype)

    @classmethod
    def from_weights(cls, name: str, /, down: jax.Array, up: jax.Array) -> "Conv2dLora":
        # torch layout: down (rank, in, kh, kw), up (out, rank, kh, kw)
        assert up.ndim == 4 and down.ndim == 4
        assert down.shape[0] == up.shape[1], f"Rank mismatch: down rank={down.shape[0]} and up rank={up.shape[1]}"
        down_kernel_size, up_kernel_size = down.shape[2], up.shape[2]
        # padding preserves spatial dims (stride 1, kernel 1 or 3) — lora.py:317-342
        down_padding = 1 if down_kernel_size == 3 else 0
        up_padding = 1 if up_kernel_size == 3 else 0
        lora = cls(
            name,
            in_channels=down.shape[1],
            out_channels=up.shape[0],
            rank=down.shape[0],
            kernel_size=(down_kernel_size, up_kernel_size),
            padding=(down_padding, up_padding),
            dtype=up.dtype,
        )
        lora.load_weights(down_weight=down, up_weight=up)
        return lora

    def lora_layers(self, device: Any = None, dtype: Any = None) -> tuple[fl.Conv2d, fl.Conv2d]:
        return (
            fl.Conv2d(
                self.in_channels,
                self.rank,
                kernel_size=self.kernel_size[0],
                stride=self.stride[0],
                padding=self.padding[0],
                use_bias=False,
                device=device,
                dtype=dtype,
            ),
            fl.Conv2d(
                self.rank,
                self.out_channels,
                kernel_size=self.kernel_size[1],
                stride=self.stride[1],
                padding=self.padding[1],
                use_bias=False,
                device=device,
                dtype=dtype,
            ),
        )

    def is_compatible(self, layer: fl.WeightedModule, /) -> bool:
        if (
            isinstance(layer, fl.Conv2d)
            and layer.in_channels == self.in_channels
            and layer.out_channels == self.out_channels
        ):
            # stride is not inferable from weights; mirror the target's
            self.down.stride = layer.stride
            return True
        return False

    @staticmethod
    def _convert_weights(down: jax.Array, up: jax.Array) -> tuple[jax.Array, jax.Array]:
        # OIHW → HWIO
        return jnp.transpose(jnp.asarray(down), (2, 3, 1, 0)), jnp.transpose(jnp.asarray(up), (2, 3, 1, 0))

    def checkpoint_weights(self) -> tuple[jax.Array, jax.Array]:
        return jnp.transpose(self.down.weight, (3, 2, 0, 1)), jnp.transpose(self.up.weight, (3, 2, 0, 1))


class LoraAdapter(fl.Sum, Adapter[fl.WeightedModule]):
    """Sum(target, *loras) with named multi-LoRA management (lora.py:383)."""

    def __init__(self, target: fl.WeightedModule, /, *loras: Lora[Any]) -> None:
        with self.setup_adapter(target):
            super().__init__(target, *loras)

    @property
    def lora_layers(self) -> Iterator[Lora[Any]]:
        return cast(Iterator[Lora[Any]], self.layers(Lora))

    @property
    def names(self) -> list[str]:
        return [lora.name for lora in self.lora_layers]

    @property
    def loras(self) -> dict[str, Lora[Any]]:
        return {lora.name: lora for lora in self.lora_layers}

    @property
    def scales(self) -> dict[str, float]:
        return {lora.name: lora.scale for lora in self.lora_layers}

    @scales.setter
    def scale(self, values: dict[str, float]) -> None:
        for name, value in values.items():
            self.loras[name].scale = value

    def add_lora(self, lora: Lora[Any], /) -> None:
        assert lora.name not in self.names, f"LoRA layer with name {lora.name} already exists"
        self.append(lora)

    def remove_lora(self, name: str, /) -> Lora[Any] | None:
        if name in self.names:
            lora = self.loras[name]
            self.remove(lora)
            return lora
        return None


def _auto_attach_loras(
    loras: dict[str, Lora[Any]],
    target: fl.Chain,
    /,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    debug_map: list[tuple[str, str]] | None = None,
) -> list[str]:
    failed_keys: list[str] = []
    for key, lora in loras.items():
        if attached := lora.auto_attach(target, include=include, exclude=exclude):
            adapter, parent = attached
            if parent is None:
                # `adapter` was already injected; `lora` has been added to it
                if debug_map is not None:
                    debug_map.append((key, adapter.get_path()))
                continue
            if debug_map is not None:
                debug_map.append((key, adapter.target.get_path(parent)))
            adapter.inject(parent)
        else:
            failed_keys.append(key)
    return failed_keys


def auto_attach_loras(
    loras: dict[str, Lora[Any]],
    target: fl.Chain,
    /,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    sanity_check: bool = True,
    debug_map: list[tuple[str, str]] | None = None,
) -> list[str]:
    """Attach many LoRAs with an optional attach-once/reattach-all-fail sanity
    check (lora.py:479-523)."""
    if not sanity_check:
        return _auto_attach_loras(loras, target, include=include, exclude=exclude, debug_map=debug_map)

    loras_copy = {
        key: Lora.from_weights(lora.name, *lora.checkpoint_weights()) for key, lora in loras.items()
    }
    debug_map_1: list[tuple[str, str]] = []
    failed_keys_1 = _auto_attach_loras(loras, target, include=include, exclude=exclude, debug_map=debug_map_1)
    if debug_map is not None:
        debug_map += debug_map_1
    if len(debug_map_1) != len(loras) or failed_keys_1:
        raise ValueError(
            f"sanity check failed: {len(debug_map_1)} / {len(loras)} LoRA layers attached, {len(failed_keys_1)} failed"
        )

    # re-running the attach must attach nothing
    debug_map_2: list[tuple[str, str]] = []
    failed_keys_2 = _auto_attach_loras(loras_copy, target, include=include, exclude=exclude, debug_map=debug_map_2)
    if debug_map_2 or len(failed_keys_2) != len(loras):
        raise ValueError(
            f"sanity check failed: {len(debug_map_2)} / {len(loras)} LoRA layers attached twice, {len(failed_keys_2)} skipped"
        )
    return failed_keys_1
