"""SDXL double text encoder (CLIP-L[:-2] ‖ CLIP-G with pooling).

Reference: /root/reference/src/refiners/foundationals/latent_diffusion/stable_diffusion_xl/text_encoder.py
(TextEncoderWithPooling :14, DoubleTextEncoder :62).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.adapters.adapter import Adapter
from refiners_tpu.fluxion.context import Contexts
from refiners_tpu.foundationals.clip.text_encoder import CLIPTextEncoderG, CLIPTextEncoderL
from refiners_tpu.foundationals.clip.tokenizer import CLIPTokenizer


class TextEncoderWithPooling(fl.Chain, Adapter[CLIPTextEncoderG]):
    """Wrap CLIP-G to also produce the EOT-pooled projected embedding."""

    def __init__(self, target: CLIPTextEncoderG, projection: fl.Linear | None = None) -> None:
        with self.setup_adapter(target=target):
            tokenizer = target.ensure_find(CLIPTokenizer)
            super().__init__(
                tokenizer,
                fl.SetContext(
                    context="text_encoder_pooling", key="end_of_text_index", callback=self.set_end_of_text_index
                ),
                target[1:-2],
                fl.Parallel(
                    fl.Identity(),
                    fl.Chain(
                        target[-2:],
                        projection or fl.Linear(in_features=1280, out_features=1280, bias=False),
                        fl.Lambda(func=self.pool),
                    ),
                ),
            )

    def init_context(self) -> Contexts:
        return {"text_encoder_pooling": {"end_of_text_index": []}}

    def __call__(self, text: str | list[str]) -> tuple[jax.Array, jax.Array]:
        return super().__call__(text)

    @property
    def tokenizer(self) -> CLIPTokenizer:
        return self.ensure_find(CLIPTokenizer)

    def set_end_of_text_index(self, end_of_text_index: list[int], tokens: jax.Array) -> None:
        eot = self.tokenizer.end_of_text_token_id
        positions = np.argmax(np.asarray(tokens) == eot, axis=1)
        end_of_text_index.extend(int(p) for p in positions)

    def pool(self, x: jax.Array) -> jax.Array:
        end_of_text_index = self.use_context("text_encoder_pooling").get("end_of_text_index", [])
        assert len(end_of_text_index) == x.shape[0], "End of text index not found."
        return jnp.stack([x[i, end_of_text_index[i], :] for i in range(x.shape[0])], axis=0)


class DoubleTextEncoder(fl.Chain):
    """Parallel CLIP-L[:-2] + CLIP-G; concat 768+1280→2048 plus pooled 1280."""

    def __init__(
        self,
        text_encoder_l: CLIPTextEncoderL | None = None,
        text_encoder_g: CLIPTextEncoderG | None = None,
        projection: fl.Linear | None = None,
        device: Any = None,
        dtype: Any = None,
    ) -> None:
        text_encoder_l = text_encoder_l or CLIPTextEncoderL(device=device, dtype=dtype)
        text_encoder_g = text_encoder_g or CLIPTextEncoderG(device=device, dtype=dtype)
        super().__init__(
            fl.Parallel(text_encoder_l[:-2], text_encoder_g),
            fl.Lambda(self.concatenate_embeddings),
        )
        tep = TextEncoderWithPooling(target=text_encoder_g, projection=projection)
        tep.inject(self.layer("Parallel", fl.Parallel))

    def __call__(self, text: str | list[str]) -> tuple[jax.Array, jax.Array]:
        return super().__call__(text)

    def concatenate_embeddings(
        self, text_embedding_l: jax.Array, text_embedding_with_pooling: tuple[jax.Array, jax.Array]
    ) -> tuple[jax.Array, jax.Array]:
        text_embedding_g, pooled_text_embedding = text_embedding_with_pooling
        text_embedding = jnp.concatenate((text_embedding_l, text_embedding_g), axis=-1)
        return text_embedding, pooled_text_embedding

    def structural_copy(self: "DoubleTextEncoder") -> "DoubleTextEncoder":
        old_tep = self.ensure_find(TextEncoderWithPooling)
        old_tep.eject()
        copy = super().structural_copy()
        old_tep.inject()

        new_text_encoder_g = copy.ensure_find(CLIPTextEncoderG)
        projection = old_tep.layer(("Parallel", "Chain", "Linear"), fl.Linear)
        new_tep = TextEncoderWithPooling(target=new_text_encoder_g, projection=projection)
        new_tep.inject(copy.layer("Parallel", fl.Parallel))
        return copy
