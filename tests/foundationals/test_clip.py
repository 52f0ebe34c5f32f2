"""CLIP parity vs transformers (random weights, CPU) + tokenizer behavior.

Mirrors the reference's weight-based parity strategy
(/root/reference/tests/foundationals/clip) but uses randomly-initialized
upstream models converted through our recipes, so it runs with zero downloads.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from refiners_tpu.conversion.models.clip_text import hf_clip_text_recipe
from refiners_tpu.conversion.utils import convert_state_dict
from refiners_tpu.foundationals.clip import CLIPTextEncoder, CLIPTokenizer

VOCAB = Path("/root/reference/src/refiners/foundationals/clip/bpe_simple_vocab_16e6.txt.gz")

needs_vocab = pytest.mark.skipif(not VOCAB.exists(), reason="CLIP vocab data not available")


@pytest.fixture(scope="module")
def tokenizer() -> CLIPTokenizer:
    return CLIPTokenizer()


@needs_vocab
def test_tokenizer_basics(tokenizer: CLIPTokenizer) -> None:
    ids = tokenizer("a photo of a cat")
    assert ids.shape == (1, 77)
    assert int(ids[0, 0]) == 49406
    arr = np.asarray(ids[0])
    eot = np.where(arr == 49407)[0]
    assert len(eot) >= 1 and eot[0] > 1
    # padding with EOT id after the first EOT
    assert (arr[eot[0] :] == 49407).all()


@needs_vocab
def test_tokenizer_matches_transformers(tokenizer: CLIPTokenizer) -> None:
    # Compare against transformers' pure-python CLIP BPE on a few prompts,
    # reconstructing its tokenizer from the same merge table.
    ct = None
    try:
        from transformers import CLIPTokenizer as HFCLIPTokenizer  # type: ignore

        import gzip
        import json
        import tempfile

        merges = gzip.open(VOCAB).read().decode("utf-8").split("\n")[1 : 49152 - 256 - 2 + 1]
        # rebuild the HF vocab json exactly as openai/CLIP does
        from refiners_tpu.foundationals.clip.tokenizer import _bytes_to_unicode

        base = list(_bytes_to_unicode().values())
        vocab = base + [f"{t}</w>" for t in base] + ["".join(m.split()) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        with tempfile.TemporaryDirectory() as d:
            vf = Path(d) / "vocab.json"
            mf = Path(d) / "merges.txt"
            vf.write_text(json.dumps({t: i for i, t in enumerate(vocab)}))
            mf.write_text("\n".join(["#version: 0.2"] + merges))
            ct = HFCLIPTokenizer(str(vf), str(mf))
    except Exception:
        pytest.skip("transformers CLIPTokenizer unavailable")

    prompts = [
        "a photo of a cat",
        "Intricate detail, masterpiece, 4k!!",
        "three-dimensional render of a futuristic city, ultra HD",
        "it's a trap: don't go",
    ]
    for p in prompts:
        expected = ct(p)["input_ids"]
        got = [int(t) for t in tokenizer.encode(p)]
        assert got == expected, f"{p}: {got} != {expected}"


@needs_vocab
def test_text_encoder_matches_transformers(tokenizer: CLIPTokenizer) -> None:
    from transformers import CLIPTextConfig, CLIPTextModel  # type: ignore

    torch.manual_seed(0)
    config = CLIPTextConfig(
        vocab_size=49408,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
    )
    hf = CLIPTextModel(config).eval()

    ours = CLIPTextEncoder(
        embedding_dim=64,
        num_layers=3,
        num_attention_heads=4,
        feedforward_dim=128,
        use_quick_gelu=True,
        tokenizer=tokenizer,
    )
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    ours.load_state_dict(convert_state_dict(state, hf_clip_text_recipe()))

    ids = tokenizer("a photo of a cat riding a bicycle")
    with torch.no_grad():
        expected = hf(input_ids=torch.from_numpy(np.asarray(ids))).last_hidden_state.numpy()
    got = np.asarray(ours("a photo of a cat riding a bicycle"))
    np.testing.assert_allclose(got, expected, atol=2e-5)


@needs_vocab
def test_concept_extender(tokenizer: CLIPTokenizer) -> None:
    from refiners_tpu.foundationals.clip import ConceptExtender

    encoder = CLIPTextEncoder(
        embedding_dim=32, num_layers=1, num_attention_heads=2, feedforward_dim=64, tokenizer=tokenizer
    )
    extender = ConceptExtender(encoder)
    emb = jnp.ones((32,))
    extender.add_concept("<gta5-artwork>", emb)
    extender.inject()

    new_tokenizer = encoder.ensure_find(CLIPTokenizer)
    ids = new_tokenizer.encode("a <gta5-artwork> style painting")
    assert 49408 in [int(t) for t in ids]
    out = encoder("a <gta5-artwork> style painting")
    assert out.shape == (1, 77, 32)

    extender.eject()
    assert encoder.ensure_find(CLIPTokenizer) is tokenizer
