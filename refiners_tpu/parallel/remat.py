"""Rematerialization (activation checkpointing) for chain subtrees.

TPU-native training memory lever (no reference equivalent): wraps selected
sub-chains in `jax.checkpoint`, so their activations are recomputed in the
backward pass instead of stored — trading FLOPs for HBM, which is usually the
binding constraint on TPU.

The wrapped subtree's weights and any closed-over context values become the
checkpointed function's inputs. Subtrees may *read* contexts (reads close
over the traced value); subtrees that *write* contexts consumed outside the
subtree must not be wrapped — the written tracer would escape the remat
region.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax

import refiners_tpu.fluxion.layers as fl


class Recompute(fl.Chain):
    """Chain whose forward runs under `jax.checkpoint`.

    The module (weights, contexts) is closed over, not passed as an argument:
    closed-over tracers become residuals (weights are stored anyway), the
    live context provider stays attached, and only the subtree's
    activations are rematerialized in the backward pass.
    """

    def forward(self, *args: Any) -> Any:
        def fn(*inner: Any) -> Any:
            return fl.Chain.forward(self, *inner)

        return jax.checkpoint(fn)(*args)


def apply_remat(root: fl.Chain, types: type[fl.Module] | tuple[type[fl.Module], ...]) -> int:
    """Wrap every instance of `types` found under `root` in a `Recompute`.

    Returns the number of wrapped modules. The wrap is ordinary chain
    surgery: `eject`-style removal is `parent.replace(wrapper, wrapper[0])`.
    """
    matches = [(module, parent) for module, parent in root.walk(recurse=True) if isinstance(module, types)]
    for module, parent in matches:
        with module.no_parent_refresh():
            wrapper = Recompute(module)
        parent.replace(module, wrapper)
    return len(matches)


def remove_remat(root: fl.Chain) -> int:
    """Undo `apply_remat`: unwrap every `Recompute` under `root`."""
    wrappers = [(module, parent) for module, parent in root.walk(Recompute, recurse=True)]
    for wrapper, parent in wrappers:
        inner = wrapper[0]
        with inner.no_parent_refresh():
            parent.replace(wrapper, inner)
        inner._set_parent(parent)
    return len(wrappers)
