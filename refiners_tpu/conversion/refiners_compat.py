"""Refiners-layout checkpoint compatibility.

Because our Chains reproduce the reference's structure and naming, a
reference (refiners) state dict maps onto ours key-for-key; only per-layer
*layouts* differ (torch Linear (out,in) vs our (in,out); OIHW vs HWIO convs).
This module resolves each key's owning layer in the target module tree and
applies the right transform — one converter for every model family.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

import refiners_tpu.fluxion.layers as fl


def _resolve_owner(module: fl.Module, path: list[str]) -> Any:
    obj: Any = module
    for part in path:
        if isinstance(obj, fl.Module) and hasattr(obj, "_modules") and part in obj._modules:  # type: ignore[attr-defined]
            obj = obj._modules[part]  # type: ignore[attr-defined]
        elif isinstance(obj, dict):
            obj = obj[part]
        else:
            obj = getattr(obj, part)
    return obj


def convert_refiners_state_dict(
    state: dict[str, Any], target: fl.Module, strict: bool = True
) -> dict[str, jax.Array]:
    """Translate a reference-layout state dict into `target`'s layouts."""
    own = target.state_dict()
    out: dict[str, jax.Array] = {}
    for key, value in state.items():
        if key not in own:
            if strict:
                raise KeyError(f"unexpected key {key!r} (not present in target module)")
            continue
        arr = jnp.asarray(np.asarray(value))
        parts = key.split(".")
        owner = _resolve_owner(target, parts[:-1])
        leaf = parts[-1]
        if leaf == "weight":
            if isinstance(owner, fl.ConvTranspose2d):
                arr = jnp.transpose(arr, (2, 3, 0, 1))  # (in,out,kh,kw) → HWIO
            elif isinstance(owner, fl.Conv2d):
                arr = jnp.transpose(arr, (2, 3, 1, 0))  # OIHW → HWIO
            elif isinstance(owner, fl.Linear):
                arr = jnp.transpose(arr)  # (out,in) → (in,out)
        out[key] = arr
    if strict:
        missing = [k for k in own if k not in out]
        if missing:
            raise KeyError(f"missing keys for target: {missing[:8]}{'...' if len(missing) > 8 else ''}")
    return out


def load_reference_state_dict(target: fl.Module, state: dict[str, Any], strict: bool = True) -> None:
    target.load_state_dict(convert_refiners_state_dict(state, target, strict=strict), strict=strict)
