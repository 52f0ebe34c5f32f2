"""SDXL DoubleTextEncoder parity vs reference (small random encoders)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

VOCAB = Path("/root/reference/src/refiners/foundationals/clip/bpe_simple_vocab_16e6.txt.gz")

pytestmark = pytest.mark.skipif(
    not (reference_available() and VOCAB.exists()), reason="reference package unavailable"
)


def test_double_text_encoder_matches_reference() -> None:
    torch.manual_seed(0)
    from refiners.foundationals.clip.text_encoder import CLIPTextEncoder as RefText
    from refiners.foundationals.clip.tokenizer import CLIPTokenizer as RefTok
    import refiners.fluxion.layers as rfl
    from refiners.foundationals.latent_diffusion.stable_diffusion_xl.text_encoder import (
        DoubleTextEncoder as RefDouble,
    )

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.clip.text_encoder import CLIPTextEncoder
    from refiners_tpu.foundationals.clip.tokenizer import CLIPTokenizer
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.text_encoder import DoubleTextEncoder

    l_kw = dict(embedding_dim=64, num_layers=2, num_attention_heads=4, feedforward_dim=128, use_quick_gelu=True)
    g_kw = dict(embedding_dim=96, num_layers=2, num_attention_heads=4, feedforward_dim=192)

    ref = RefDouble(
        text_encoder_l=RefText(**l_kw),
        text_encoder_g=RefText(tokenizer=RefTok(pad_token_id=0), **g_kw),
        projection=rfl.Linear(96, 96, bias=False),
    )
    ours = DoubleTextEncoder(
        text_encoder_l=CLIPTextEncoder(**l_kw),
        text_encoder_g=CLIPTextEncoder(tokenizer=CLIPTokenizer(pad_token_id=0), **g_kw),
        projection=fl.Linear(96, 96, bias=False),
    )
    load_reference_state_dict(ours, {k: v.detach().numpy() for k, v in ref.state_dict().items()})

    prompt = "a majestic castle on a hill, golden hour"
    with torch.no_grad():
        ref_emb, ref_pooled = ref(prompt)
    our_emb, our_pooled = ours(prompt)

    np.testing.assert_allclose(np.asarray(our_emb), ref_emb.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(our_pooled), ref_pooled.numpy(), atol=1e-4)
