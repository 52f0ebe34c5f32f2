"""Pipeline wiring smoke test (tiny sizes, random weights)."""

from pathlib import Path

import pytest

VOCAB = Path("/root/reference/src/refiners/foundationals/clip/bpe_simple_vocab_16e6.txt.gz")


@pytest.mark.slow
@pytest.mark.skipif(not VOCAB.exists(), reason="CLIP vocab data not available")
def test_text_to_image_pipeline_runs() -> None:
    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.latent_diffusion import DDIM, StableDiffusion_1
    from refiners_tpu.pipelines import TextToImage

    manual_seed(0)
    sd = StableDiffusion_1(solver=DDIM(num_inference_steps=1))
    pipe = TextToImage(sd, size=(64, 64))
    image = pipe("a tiny test", seed=7)
    assert image.size == (64, 64)
    # deterministic per seed
    image2 = pipe("a tiny test", seed=7)
    assert list(image.getdata()) == list(image2.getdata())
