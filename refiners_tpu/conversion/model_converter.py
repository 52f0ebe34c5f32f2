"""ModelConverter: autotracing weight conversion torch → refiners-tpu.

Reference: /root/reference/src/refiners/conversion/model_converter.py:62
(`_trace_module_execution_order` :526, `map_state_dicts` :260, staged
lifecycle :46, `compare_models` :305). Runs the torch source and the JAX
target side by side, hooks every basic layer, aligns them by execution order
and parameter signature, then emits a layout-converted state dict.
"""

from __future__ import annotations

import contextlib
from collections import defaultdict
from enum import Enum, auto
from pathlib import Path
from typing import Any, Iterator, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

import refiners_tpu.fluxion.layers as fl

ModuleArgs = tuple[Any, ...] | dict[str, Any]


class ConversionStage(Enum):
    """Lifecycle of a conversion (model_converter.py:46)."""

    INIT = auto()
    BASIC_LAYERS_MATCH = auto()
    SHAPE_AND_LAYERS_MATCH = auto()
    MODELS_OUTPUT_AGREE = auto()


_TARGET_BASIC_LAYERS = (
    fl.Linear,
    fl.Conv2d,
    fl.ConvTranspose2d,
    fl.LayerNorm,
    fl.GroupNorm,
    fl.LayerNorm2d,
    fl.Embedding,
)


def _source_basic_layers() -> tuple[type, ...]:
    import torch

    return (
        torch.nn.Linear,
        torch.nn.Conv2d,
        torch.nn.ConvTranspose2d,
        torch.nn.LayerNorm,
        torch.nn.GroupNorm,
        torch.nn.Embedding,
    )


def _param_signature_torch(module: Any) -> tuple[tuple[str, tuple[int, ...]], ...]:
    return tuple(sorted((k, tuple(v.shape)) for k, v in module.state_dict().items()))


def _convert_value(source_key: str, value: np.ndarray, target_module: fl.Module) -> jax.Array:
    arr = jnp.asarray(value)
    if source_key.endswith("weight"):
        if isinstance(target_module, fl.ConvTranspose2d):
            return jnp.transpose(arr, (2, 3, 0, 1))
        if isinstance(target_module, fl.Conv2d) and arr.ndim == 4:
            return jnp.transpose(arr, (2, 3, 1, 0))
        if isinstance(target_module, fl.Linear) and arr.ndim == 2:
            return jnp.transpose(arr)
    return arr


def _signature_matches(source_module: Any, target_module: fl.Module) -> bool:
    src = dict(_param_signature_torch(source_module))
    tgt = {k: tuple(v.shape) for k, v in target_module.state_dict().items()}
    if set(src) != set(tgt):
        return False
    for key, src_shape in src.items():
        converted = _convert_value(key, np.zeros(src_shape, dtype=np.float32), target_module)
        if tuple(converted.shape) != tgt[key]:
            return False
    return True


class ModelConverter:
    """Align a torch source and a refiners-tpu target by execution order.

    Example:
        converter = ModelConverter(source_model=torch_model, target_model=our_model)
        assert converter.run(source_args=(x_torch,), target_args=(x_jax,))
    """

    stage: ConversionStage = ConversionStage.INIT

    def __init__(
        self,
        source_model: Any,
        target_model: fl.Module,
        threshold: float = 1e-5,
        skip_output_check: bool = False,
        verbose: bool = True,
    ) -> None:
        self.source_model = source_model
        self.target_model = target_model
        self.threshold = threshold
        self.skip_output_check = skip_output_check
        self.verbose = verbose
        self._mapping: dict[str, str] | None = None

    def __repr__(self) -> str:
        return (
            f"ModelConverter(source_model={self.source_model.__class__.__name__}, "
            f"target_model={self.target_model.__class__.__name__}, stage={self.stage.name})"
        )

    def __bool__(self) -> bool:
        return self.stage == ConversionStage.MODELS_OUTPUT_AGREE or (
            self.skip_output_check and self.stage == ConversionStage.SHAPE_AND_LAYERS_MATCH
        )

    def _log(self, message: str) -> None:
        if self.verbose:
            print(message)

    # -- tracing -------------------------------------------------------------

    def _trace_source_execution_order(self, args: ModuleArgs) -> list[tuple[str, Any]]:
        import torch

        order: list[tuple[str, Any]] = []
        handles = []
        basic = _source_basic_layers()
        named = {id(m): n for n, m in self.source_model.named_modules()}

        def hook(module: Any, *_: Any) -> None:
            order.append((named[id(module)], module))

        for _, module in self.source_model.named_modules():
            if isinstance(module, basic):
                handles.append(module.register_forward_hook(hook))
        try:
            with torch.no_grad():
                self._call(self.source_model, args)
        finally:
            for h in handles:
                h.remove()
        return order

    @contextlib.contextmanager
    def _record_target_layers(self, order: list[tuple[str, fl.Module]]) -> Iterator[None]:
        paths = {id(m): p for p, m in self.target_model.named_modules()}
        originals = {}

        def make_wrapper(cls: type) -> Any:
            original = cls.forward

            def wrapped(self_: fl.Module, *a: Any, **k: Any) -> Any:
                out = original(self_, *a, **k)
                if id(self_) in paths:
                    order.append((paths[id(self_)], self_))
                return out

            return original, wrapped

        for cls in _TARGET_BASIC_LAYERS:
            original, wrapped = make_wrapper(cls)
            originals[cls] = original
            cls.forward = wrapped  # type: ignore[method-assign]
        try:
            yield
        finally:
            for cls, original in originals.items():
                cls.forward = original  # type: ignore[method-assign]

    def _trace_target_execution_order(self, args: ModuleArgs) -> list[tuple[str, fl.Module]]:
        order: list[tuple[str, fl.Module]] = []
        with self._record_target_layers(order):
            self._call(self.target_model, args)
        # the wrapper records nested calls; keep first occurrence order of unique modules
        seen: set[int] = set()
        unique: list[tuple[str, fl.Module]] = []
        for path, module in order:
            if id(module) not in seen:
                seen.add(id(module))
                unique.append((path, module))
        return unique

    @staticmethod
    def _call(model: Any, args: ModuleArgs) -> Any:
        if isinstance(args, dict):
            return model(**args)
        return model(*args)

    # -- mapping -------------------------------------------------------------

    def map_state_dicts(self, source_args: ModuleArgs, target_args: ModuleArgs | None = None) -> dict[str, str] | None:
        """Build target-path → source-path mapping by execution order (:260)."""
        target_args = target_args if target_args is not None else source_args
        source_order = self._trace_source_execution_order(source_args)
        target_order = self._trace_target_execution_order(target_args)

        # source hooks fire once per call; dedup like the target side
        seen: set[int] = set()
        source_unique = []
        for name, module in source_order:
            if id(module) not in seen:
                seen.add(id(module))
                source_unique.append((name, module))

        if len(source_unique) != len(target_order):
            self._log(
                f"layer count mismatch: source {len(source_unique)} != target {len(target_order)}"
            )
            by_type_src: dict[str, int] = defaultdict(int)
            for _, m in source_unique:
                by_type_src[type(m).__name__] += 1
            by_type_tgt: dict[str, int] = defaultdict(int)
            for _, m in target_order:
                by_type_tgt[type(m).__name__] += 1
            self._log(f"source: {dict(by_type_src)}\ntarget: {dict(by_type_tgt)}")
            return None
        self.stage = ConversionStage.BASIC_LAYERS_MATCH

        mapping: dict[str, str] = {}
        for (src_name, src_module), (tgt_path, tgt_module) in zip(source_unique, target_order):
            if not _signature_matches(src_module, tgt_module):
                self._log(
                    f"signature mismatch at {tgt_path} ({type(tgt_module).__name__}) "
                    f"vs {src_name} ({type(src_module).__name__})"
                )
                return None
            mapping[tgt_path] = src_name
        self.stage = ConversionStage.SHAPE_AND_LAYERS_MATCH
        self._mapping = mapping
        return mapping

    def convert_state_dict(self, mapping: dict[str, str] | None = None) -> dict[str, jax.Array]:
        """Produce the converted flat target state dict."""
        mapping = mapping if mapping is not None else self._mapping
        assert mapping is not None, "call map_state_dicts first"
        source_state = {k: v.detach().cpu().numpy() for k, v in self.source_model.state_dict().items()}
        target_modules = dict(self.target_model.named_modules())
        out: dict[str, jax.Array] = {}
        for tgt_path, src_name in mapping.items():
            tgt_module = target_modules[tgt_path]
            for param_key in tgt_module.state_dict():
                if "." in param_key:
                    continue  # leaf params only; nested handled by their own mapping
                src_key = f"{src_name}.{param_key}" if src_name else param_key
                if src_key not in source_state:
                    continue
                out[f"{tgt_path}.{param_key}" if tgt_path else param_key] = _convert_value(
                    param_key, source_state[src_key], tgt_module
                )
        return out

    def load(self) -> None:
        self.target_model.load_state_dict(self.convert_state_dict(), strict=False)

    # -- comparison ----------------------------------------------------------

    def compare_models(
        self, source_args: ModuleArgs, target_args: ModuleArgs | None = None, threshold: float | None = None
    ) -> bool:
        """Numeric output check (:305)."""
        import torch

        threshold = threshold if threshold is not None else self.threshold
        target_args = target_args if target_args is not None else source_args
        with torch.no_grad():
            source_out = self._call(self.source_model, source_args)
        target_out = self._call(self.target_model, target_args)
        source_np = np.asarray(source_out.detach().cpu().numpy(), dtype=np.float32)
        target_np = np.asarray(target_out, dtype=np.float32)
        if source_np.shape != target_np.shape:
            # NHWC target vs NCHW source: auto-transpose when it reconciles
            if target_np.ndim == 4 and target_np.transpose(0, 3, 1, 2).shape == source_np.shape:
                target_np = target_np.transpose(0, 3, 1, 2)
            else:
                self._log(f"output shape mismatch: {source_np.shape} vs {target_np.shape}")
                return False
        max_diff = float(np.abs(source_np - target_np).max())
        self._log(f"max output difference: {max_diff:.2e} (threshold {threshold:.2e})")
        if max_diff < threshold:
            self.stage = ConversionStage.MODELS_OUTPUT_AGREE
            return True
        return False

    def run(self, source_args: ModuleArgs, target_args: ModuleArgs | None = None) -> bool:
        """Full pipeline: trace → map → load → compare."""
        if self.map_state_dicts(source_args, target_args) is None:
            return False
        self.load()
        if self.skip_output_check:
            return True
        return self.compare_models(source_args, target_args)

    def save_to_safetensors(self, path: Path | str, metadata: dict[str, str] | None = None) -> None:
        from refiners_tpu.fluxion.utils import save_to_safetensors

        save_to_safetensors(path, self.target_model.state_dict(), metadata=metadata)
