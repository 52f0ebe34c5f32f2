from refiners_tpu.parallel.inference import batch_sharding, shard_inputs, shard_latent_diffusion
from refiners_tpu.parallel.mesh import make_mesh
from refiners_tpu.parallel.remat import Recompute, apply_remat, remove_remat
from refiners_tpu.parallel.sharding import (
    ATTENTION_TP_RULES,
    PartitionRule,
    data_sharding,
    infer_partition_spec,
    replicate_module,
    shard_module,
)

__all__ = [
    "Recompute",
    "apply_remat",
    "remove_remat",
    "make_mesh",
    "ATTENTION_TP_RULES",
    "PartitionRule",
    "batch_sharding",
    "data_sharding",
    "infer_partition_spec",
    "replicate_module",
    "shard_inputs",
    "shard_latent_diffusion",
    "shard_module",
]
