"""Native (C++) component tests: BPE engine parity with the Python path."""

import time
from pathlib import Path

import pytest

VOCAB = Path("/root/reference/src/refiners/foundationals/clip/bpe_simple_vocab_16e6.txt.gz")

needs_vocab = pytest.mark.skipif(not VOCAB.exists(), reason="CLIP vocab data not available")


@needs_vocab
def test_native_bpe_matches_python() -> None:
    from refiners_tpu.foundationals.clip import CLIPTokenizer

    tok = CLIPTokenizer()
    if tok._native is None:
        pytest.skip("native BPE unavailable (no g++)")

    prompts = [
        "a photo of a cat",
        "Intricate detail, masterpiece, 4k!! photorealistic, 8k, ultra-detailed",
        "it's a trap: don't go...",
        "zxqwjy flurbish contraption 12345",
        "émoji soupçon façade",  # unicode through the byte fallback
    ]
    for p in prompts:
        native_ids = tok.encode_str(p)
        tok_py = object.__new__(CLIPTokenizer)
        tok_py.__dict__ = {**tok.__dict__, "_native": None, "_cache": {}}
        python_ids = tok_py.encode_str(p)
        assert native_ids == python_ids, f"{p!r}: {native_ids} != {python_ids}"


@needs_vocab
def test_native_bpe_is_faster() -> None:
    from refiners_tpu.foundationals.clip import CLIPTokenizer

    tok = CLIPTokenizer()
    if tok._native is None:
        pytest.skip("native BPE unavailable (no g++)")

    text = " ".join(f"extraordinarily complicated combination {i}" for i in range(50))

    t0 = time.perf_counter()
    for _ in range(20):
        tok._cache.clear()
        native_ids = tok.encode_str(text)
    native_time = time.perf_counter() - t0

    tok_py = object.__new__(CLIPTokenizer)
    tok_py.__dict__ = {**tok.__dict__, "_native": None}
    t0 = time.perf_counter()
    for _ in range(20):
        tok_py._cache = {}
        python_ids = tok_py.encode_str(text)
    python_time = time.perf_counter() - t0

    assert native_ids == python_ids
    assert native_time < python_time, f"native {native_time:.4f}s vs python {python_time:.4f}s"
