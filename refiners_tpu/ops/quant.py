"""Int8 weight quantization (Pallas kernels + quantized layers).

TPU-native serving feature with no reference equivalent: per-channel int8
weights halve HBM traffic for the matmul-bound UNet/text-encoder layers; the
MXU multiplies int8 natively with int32 accumulation. Quantization uses the
hardware PRNG for stochastic rounding (pallas_guide.md §Quantization).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import refiners_tpu.fluxion.layers as fl

_QUANT_BLOCK_COLS = 256  # 5120 rows × 256 cols f32 ≈ 5 MB/buffer in VMEM


def _quantize_kernel(x_ref, seed_ref, values_ref, scales_ref):
    """Per-column (output-feature) int8 quantization with stochastic rounding.

    Gridded over column blocks: each program sees every row of its columns
    (the per-channel abs-max needs the full column), so VMEM holds only
    in_features × _QUANT_BLOCK_COLS floats — a full SDXL FF weight
    (5120×1280 f32 = 26 MB) would otherwise overflow the 16 MB scoped VMEM.
    """
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))  # decorrelate blocks
    x = x_ref[:]
    abs_max = jnp.max(jnp.abs(x), axis=0, keepdims=True)
    scale = jnp.maximum(abs_max, 1e-8) / 127.0
    scaled = x / scale
    # Stochastic round to the integer grid: floor(x + u), u ~ U[0, 1) from 24
    # PRNG bits. (pltpu.stochastic_round only targets bf16/f8 dtypes, not
    # int8, and Mosaic lowers no uint32→f32 cast — so mask int32 bits to 24.)
    # scale = fl(abs_max/127) can round a couple of f32 ulps below abs_max/127,
    # putting the column-max element's |scaled| marginally above 127 — and
    # floor(127.0000x + u) can then hit ±128, whose f32→int8 conversion is
    # implementation-defined (a wrap would sign-flip the channel's largest
    # weight). Clamp to the symmetric grid before the cast, like the CPU path.
    random_bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.int32)
    u = (random_bits & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
    values_ref[:] = jnp.clip(jnp.floor(scaled + u), -127.0, 127.0).astype(jnp.int8)
    scales_ref[:] = scale


def quantize_int8(w: jax.Array, seed: int = 0) -> tuple[jax.Array, jax.Array]:
    """(in, out) float weight → (int8 values, (1, out) f32 scales)."""
    assert w.ndim == 2
    try:
        on_tpu = all(d.platform == "tpu" for d in w.devices())
    except Exception:  # tracer: fall back to the compile-target heuristic
        on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # stochastic_round is TPU-only; deterministic rounding on CPU
        abs_max = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        scale = jnp.maximum(abs_max, 1e-8) / 127.0
        values = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return values, scale.astype(jnp.float32)
    rows, cols = w.shape
    # Bound VMEM by the actual row count: double-buffered f32 input blocks
    # must fit a ~12 MB budget (16 MB scoped VMEM minus output buffers), so a
    # model wider than SDXL's 5120-feature FF (where rows × 256 cols ≈ 5 MB
    # per buffer) shrinks the column block instead of overflowing.
    budget_bytes = 12 * 1024 * 1024
    max_block = max(128, budget_bytes // (rows * 4 * 2) // 128 * 128)
    block = min(_QUANT_BLOCK_COLS, max_block, cols)
    values, scales = pl.pallas_call(
        _quantize_kernel,
        grid=(pl.cdiv(cols, block),),
        out_shape=(
            jax.ShapeDtypeStruct(w.shape, jnp.int8),
            jax.ShapeDtypeStruct((1, cols), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((rows, block), lambda i: (0, i)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, block), lambda i: (0, i)),
            pl.BlockSpec((1, block), lambda i: (0, i)),
        ),
    )(w.astype(jnp.float32), jnp.asarray([seed], dtype=jnp.int32))
    return values, scales


def int8_matmul(x: jax.Array, values: jax.Array, scales: jax.Array, act_quant: bool = True) -> jax.Array:
    """x @ dequant(values), with the matmul itself in int8 when `act_quant`.

    W8A8 path (default): activations are dynamically quantized per token
    (row-wise abs-max → int8), so the dot is int8×int8→int32 — the MXU's
    int8 rate is 2× its bf16 rate on v5e, on top of the ÷2 weight HBM
    traffic. Dequantization applies the per-token activation scale and the
    per-channel weight scale to the int32 accumulator. The quant/dequant
    passes are cheap VPU elementwise work against a ≥256-feature matmul.

    W8A16 path (`act_quant=False`): weights upcast to the activation dtype
    inside the dot — saves weight HBM only, runs at the bf16 MXU rate, and
    adds no activation rounding error (used where parity matters more than
    peak rate).
    """
    if not act_quant:
        y = jax.lax.dot_general(
            x,
            values.astype(x.dtype),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y * scales.astype(jnp.float32)).astype(x.dtype)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq,
        values,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * x_scale * scales.astype(jnp.float32)).astype(x.dtype)


class QuantizedLinear(fl.WeightedModule):
    """Drop-in int8 replacement for fl.Linear (weight memory ÷4 vs f32).

    `act_quant=True` (default) also quantizes activations per token at run
    time so the matmul runs int8×int8→int32 on the MXU (2× bf16 rate on
    v5e); `act_quant=False` keeps activations in their dtype (W8A16)."""

    def __init__(self, linear: fl.Linear, seed: int = 0, act_quant: bool = True) -> None:
        super().__init__()
        self.in_features = linear.in_features
        self.out_features = linear.out_features
        self.act_quant = act_quant
        values, scales = quantize_int8(linear.weight.astype(jnp.float32), seed=seed)
        self.weight = values
        self.scales = scales
        self.bias = linear.bias

    def forward(self, x: jax.Array) -> jax.Array:
        y = int8_matmul(x, self.weight, self.scales, act_quant=self.act_quant)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y


def quantize_linears(module: fl.Chain, min_features: int = 256, act_quant: bool = True) -> int:
    """Replace every large-enough fl.Linear with a QuantizedLinear, in place.

    Returns the number of layers replaced. LoRA/small projection layers are
    skipped by the `min_features` threshold. `act_quant` selects W8A8
    (default — int8 MXU rate) vs W8A16 (weight HBM savings only).
    """
    count = 0
    for linear, parent in list(module.walk(fl.Linear, recurse=True)):
        if type(linear) is not fl.Linear:
            continue  # keep subclasses (e.g. TokenEncoder) intact
        if linear.in_features < min_features or linear.out_features < min_features:
            continue
        parent.replace(linear, QuantizedLinear(linear, seed=count, act_quant=act_quant))
        count += 1
    return count
