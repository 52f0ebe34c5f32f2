"""Int8 quantization tests (CPU deterministic path)."""

import jax
import jax.numpy as jnp
import numpy as np

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.ops.quant import QuantizedLinear, quantize_int8, quantize_linears


def test_quantize_roundtrip_error() -> None:
    w = jax.random.normal(jax.random.key(0), (128, 256)) * 0.02
    values, scales = quantize_int8(w)
    assert values.dtype == jnp.int8
    deq = values.astype(jnp.float32) * scales
    # per-channel int8: error bounded by scale/2 per element
    max_err = float(jnp.abs(deq - w).max())
    assert max_err <= float(scales.max()) * 0.51


def test_quantized_linear_close_to_float() -> None:
    lin = fl.Linear(256, 512)
    qlin = QuantizedLinear(lin)
    x = jax.random.normal(jax.random.key(1), (4, 256))
    y_f = lin(x)
    y_q = qlin(x)
    rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
    assert rel < 0.01, f"relative error {rel:.4f}"


def test_quantize_linears_in_place() -> None:
    model = fl.Chain(
        fl.Linear(512, 512),
        fl.SiLU(),
        fl.Chain(fl.Linear(512, 512)),
        fl.Linear(512, 32),  # below threshold on out_features
    )
    n = quantize_linears(model, min_features=256)
    assert n == 2
    assert isinstance(model[0], QuantizedLinear)
    assert isinstance(model[2][0], QuantizedLinear)
    assert isinstance(model[3], fl.Linear)
    out = model(jnp.ones((1, 512)))
    assert out.shape == (1, 32)


def test_quantized_linear_under_jit() -> None:
    lin = fl.Linear(256, 256)
    model = fl.Chain(lin)
    quantize_linears(model)
    x = jnp.ones((2, 256))
    eager = model(x)
    jitted = jax.jit(lambda m, v: m(v))(model, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)
