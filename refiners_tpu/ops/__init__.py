"""TPU compute kernels: functional ops backing the fluxion layers.

The layer classes in `refiners_tpu.fluxion.layers` stay thin and declarative;
the hot math lives here so it can be swapped between a pure-XLA path and
Pallas kernels without touching model code.
"""

from refiners_tpu.ops.attention import dot_product_attention, force_flash, scaled_dot_product_attention
from refiners_tpu.ops.group_norm import group_norm_silu

__all__ = ["dot_product_attention", "force_flash", "group_norm_silu", "scaled_dot_product_attention"]
