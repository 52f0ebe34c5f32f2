"""Parameter/activation sharding rules (GSPMD).

Megatron-style tensor parallelism expressed as sharding *annotations*: QKV
projections split on the output-feature axis, output projections on the
input-feature axis; XLA inserts the all-reduce on the following op. Data
parallelism shards the batch axis (the CFG pair is a natural 2-way split).
Everything composes with `jax.jit` over a ("data", "tensor") mesh — the
collectives ride ICI, chosen by the compiler (scaling-book recipe).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import refiners_tpu.fluxion.layers as fl


@dataclass
class PartitionRule:
    """Map state-dict paths (regex over dotted module paths) to PartitionSpecs."""

    pattern: str
    spec: P

    def match(self, path: str) -> bool:
        return re.search(self.pattern, path) is not None


# Tensor-parallel rules for Attention chains (layout: Linear weight (in, out)):
# - Q/K/V projections (Distribute.Linear_*): split output features → each
#   device holds a head subset; attention is embarrassingly parallel per head.
# - output projection (the Linear that follows SDPA): split input features;
#   GSPMD inserts a psum after the partial matmuls.
# - GeGLU/FF layers: split ff dim out then in (same pattern).
ATTENTION_TP_RULES: list[PartitionRule] = [
    PartitionRule(r"Distribute\.Linear(_\d+)?\.weight$", P(None, "tensor")),
    PartitionRule(r"Distribute\.Linear(_\d+)?\.bias$", P("tensor")),
    PartitionRule(r"(Attention|SelfAttention|SelfAttention2d)(_\d+)?\.Linear\.weight$", P("tensor", None)),
    PartitionRule(r"(Attention|SelfAttention|SelfAttention2d)(_\d+)?\.Linear\.bias$", P()),
    PartitionRule(r"FeedForward\.Linear_1\.weight$", P(None, "tensor")),
    PartitionRule(r"FeedForward\.Linear_1\.bias$", P("tensor")),
    PartitionRule(r"FeedForward\.Linear_2\.weight$", P("tensor", None)),
    PartitionRule(r"FeedForward\.Linear_2\.bias$", P()),
    # GeGLU inside CrossAttentionBlock: Residual_3.Linear_1 (d → 8d), Linear_2 (4d → d)
    PartitionRule(r"Residual_3\.Linear_1\.weight$", P(None, "tensor")),
    PartitionRule(r"Residual_3\.Linear_1\.bias$", P("tensor")),
    PartitionRule(r"Residual_3\.Linear_2\.weight$", P("tensor", None)),
    PartitionRule(r"Residual_3\.Linear_2\.bias$", P()),
]


def infer_partition_spec(path: str, arr: jax.Array, rules: list[PartitionRule]) -> P:
    for rule in rules:
        if rule.match(path):
            # degenerate axes (size 1) or indivisible dims fall back to replication
            return rule.spec
    return P()


def _valid_spec(arr: jax.Array, spec: P, mesh: Mesh) -> P:
    """Drop axis shardings that do not divide the dimension size."""
    if not spec:
        return spec
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    out: list[Any] = []
    for dim, s in enumerate(spec):
        if s is None:
            out.append(None)
        else:
            axis_size = sizes[s]
            out.append(s if dim < arr.ndim and arr.shape[dim] % axis_size == 0 else None)
    return P(*out)


def shard_module(
    module: fl.Module, mesh: Mesh, rules: list[PartitionRule] | None = None
) -> None:
    """Place every parameter on the mesh in place: TP rules where they match,
    replication elsewhere.

    All transfers go through ONE batched `jax.device_put` — per-array puts
    pay a full round-trip each on remote-tunnel runtimes (minutes for a
    UNet-sized tree)."""
    rules = rules if rules is not None else ATTENTION_TP_RULES

    entries = list(module.arrays())
    shardings = [
        NamedSharding(mesh, _valid_spec(arr, infer_partition_spec(path, arr, rules), mesh))
        for path, arr in entries
    ]
    placed = jax.device_put([arr for _, arr in entries], shardings)
    for (path, _), arr in zip(entries, placed):
        module._set_array_by_path(path, arr)


def replicate_module(module: fl.Module, mesh: Mesh) -> None:
    shard_module(module, mesh, rules=[])


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch axis over "data", replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))
