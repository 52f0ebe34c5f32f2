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


def test_quantize_clip_text_encoder_end_to_end() -> None:
    """The advertised integration path: int8-quantize a real CLIP text
    encoder and keep the prompt embedding within a tight envelope.

    Uses a reduced-width CLIPTextEncoder (same class, fewer layers) with the
    real tokenizer when the vocab asset is present, else a token-id forward."""
    from pathlib import Path

    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.fluxion.optimization import quantize_linears as ql
    from refiners_tpu.foundationals.clip import CLIPTextEncoder

    manual_seed(0)
    vocab = Path("/root/reference/src/refiners/foundationals/clip/bpe_simple_vocab_16e6.txt.gz")
    encoder = CLIPTextEncoder(embedding_dim=256, num_layers=4, num_attention_heads=4, feedforward_dim=1024)
    if vocab.exists():
        inp: object = "a photo of a cat riding a bicycle"
    else:
        encoder.pop(0)  # drop the tokenizer layer; feed token ids directly
        inp = jnp.asarray(np.random.RandomState(0).randint(0, 49408, size=(1, 77)))

    expected = encoder(inp)
    n = ql(encoder, min_features=256)
    assert n >= 4 * 4, f"expected all attention+FF projections quantized, got {n}"
    out = encoder(inp)

    cos = float(
        jnp.sum(expected * out) / (jnp.linalg.norm(expected) * jnp.linalg.norm(out))
    )
    rel = float(jnp.linalg.norm(out - expected) / jnp.linalg.norm(expected))
    assert cos > 0.999, f"cosine {cos}"
    assert rel < 0.05, f"relative error {rel}"


def test_quantized_linear_under_jit() -> None:
    lin = fl.Linear(256, 256)
    model = fl.Chain(lin)
    quantize_linears(model)
    x = jnp.ones((2, 256))
    eager = model(x)
    jitted = jax.jit(lambda m, v: m(v))(model, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)


def test_w8a8_int8_dot_close_to_float() -> None:
    """The serving path: per-token activation quantization + int8×int8→int32
    dot. Error budget is ~2× the weight-only path (two rounding sources)."""
    lin = fl.Linear(256, 512)
    qlin = QuantizedLinear(lin, act_quant=True)
    x = jax.random.normal(jax.random.key(2), (4, 256))
    rel = float(jnp.linalg.norm(qlin(x) - lin(x)) / jnp.linalg.norm(lin(x)))
    assert rel < 0.02, f"relative error {rel:.4f}"


def test_w8a16_skips_activation_rounding() -> None:
    """act_quant=False must reproduce the weight-only numerics: for an input
    that is exactly representable, W8A16 is exact while W8A8 rounds."""
    lin = fl.Linear(256, 512)
    q16 = QuantizedLinear(lin, act_quant=False)
    q8 = QuantizedLinear(lin, act_quant=True)
    x = jax.random.normal(jax.random.key(3), (4, 256))
    y16, y8 = q16(x), q8(x)
    deq = q16.weight.astype(jnp.float32) * q16.scales
    expect = x @ deq + lin.bias
    np.testing.assert_allclose(np.asarray(y16), np.asarray(expect), atol=1e-4)
    assert float(jnp.linalg.norm(y8 - y16)) > 0.0  # the A8 rounding is real


def test_w8a8_under_jit_matches_eager() -> None:
    model = fl.Chain(fl.Linear(256, 256))
    quantize_linears(model, act_quant=True)
    x = jax.random.normal(jax.random.key(4), (2, 256))
    eager = model(x)
    jitted = jax.jit(lambda m, v: m(v))(model, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-5)
