"""Mesh-aware latent-diffusion inference (DP over batch/CFG + optional TP).

The reference is strictly single-device (SURVEY §2.12); this layer is the
TPU-native scaling story: place the model once on a ("data", "tensor")
`jax.sharding.Mesh`, DP-shard the latent batch (the CFG pair is a natural
2-way split), TP-shard attention/FF weights via `ATTENTION_TP_RULES`, and
let GSPMD insert the ICI collectives. The denoise scan stays ONE jitted
program; no host round-trips between steps.

Reference anchor for the step being sharded:
/root/reference/src/refiners/foundationals/latent_diffusion/model.py:128-159.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from refiners_tpu.parallel.sharding import ATTENTION_TP_RULES, PartitionRule, data_sharding, shard_module

if TYPE_CHECKING:
    from refiners_tpu.foundationals.latent_diffusion.model import LatentDiffusionModel


def shard_latent_diffusion(
    sd: "LatentDiffusionModel",
    mesh: Mesh,
    tp_rules: list[PartitionRule] | None = None,
) -> None:
    """Place a LatentDiffusionModel on `mesh` in place.

    UNet attention/FF weights follow the TP rules (megatron split over the
    "tensor" axis); every other parameter — convs, time embeddings, the VAE,
    the text encoder, solver tables — is replicated. Inputs should then be
    DP-sharded on the batch axis (`batch_sharding`).
    """
    rules = tp_rules if tp_rules is not None else ATTENTION_TP_RULES
    shard_module(sd.unet, mesh, rules)
    replicated: list[PartitionRule] = []
    shard_module(sd.lda, mesh, replicated)
    shard_module(sd.clip_text_encoder, mesh, replicated)

    def replicate(_path: str, arr: jax.Array) -> jax.Array:
        return jax.device_put(arr, NamedSharding(mesh, P()))

    sd.solver.map_arrays(replicate)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Sharding for latent / embedding inputs: batch over "data"."""
    return data_sharding(mesh, ndim)


def shard_inputs(mesh: Mesh, *arrays: jax.Array) -> tuple[jax.Array, ...]:
    """DP-shard each array's leading (batch) axis over the "data" mesh axis.

    Axes whose batch does not divide the data-axis size are replicated
    instead (e.g. a single shared time_ids row).
    """
    n_data = mesh.shape["data"]
    out: list[jax.Array] = []
    for a in arrays:
        if a.ndim >= 1 and a.shape[0] % n_data == 0:
            out.append(jax.device_put(a, data_sharding(mesh, a.ndim)))
        else:
            out.append(jax.device_put(a, NamedSharding(mesh, P())))
    return tuple(out)
