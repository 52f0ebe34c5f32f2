"""Textual-inversion concept extension for CLIP.

Reference: /root/reference/src/refiners/foundationals/clip/concepts.py
(EmbeddingExtender :15, TokenExtender :53, ConceptExtender :78).
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.fluxion.adapters.adapter import Adapter
from refiners_tpu.foundationals.clip.text_encoder import CLIPTextEncoder, TokenEncoder
from refiners_tpu.foundationals.clip.tokenizer import CLIPTokenizer


class EmbeddingExtender(fl.Chain, Adapter[TokenEncoder]):
    """Adds rows to the token embedding; only new rows are trainable."""

    def __init__(self, target: TokenEncoder) -> None:
        with self.setup_adapter(target):
            super().__init__(fl.Lambda(func=self.lookup))
        self.old_weight = target.weight
        self.new_weight = jnp.zeros((0, target.weight.shape[1]), dtype=target.weight.dtype)

    def lookup(self, x: jax.Array) -> jax.Array:
        # gradients flow only into `new_weight` when the old rows are frozen
        # by the training mask; concatenation keeps lookups dynamic
        return jnp.take(jnp.concatenate([self.old_weight, self.new_weight], axis=0), x, axis=0)

    def add_embedding(self, embedding: jax.Array) -> None:
        assert embedding.shape == (self.old_weight.shape[1],)
        self.new_weight = jnp.concatenate(
            [self.new_weight, embedding[None].astype(self.new_weight.dtype)], axis=0
        )

    @property
    def num_embeddings(self) -> int:
        return self.old_weight.shape[0] + self.new_weight.shape[0]


class TokenExtender(fl.Chain, Adapter[CLIPTokenizer]):
    """Adds a regex branch + fixed id to a copy of the tokenizer."""

    def __init__(self, target: CLIPTokenizer) -> None:
        with self.setup_adapter(target):
            super().__init__(
                CLIPTokenizer(
                    vocabulary_path=target.vocabulary_path,
                    sequence_length=target.sequence_length,
                    start_of_text_token_id=target.start_of_text_token_id,
                    end_of_text_token_id=target.end_of_text_token_id,
                    pad_token_id=target.pad_token_id,
                )
            )

    def add_token(self, token: str, token_id: int) -> None:
        token = token.lower()
        tokenizer = self.ensure_find(CLIPTokenizer)
        assert token_id not in tokenizer._encoder.values()
        tokenizer._encoder[token] = token_id
        tokenizer._pattern = re.compile(
            re.escape(token) + "|" + tokenizer._pattern.pattern, re.IGNORECASE
        )
        # the concept token is its own smallest subtoken
        tokenizer._cache[token] = [token]
        # BPE byte-mapping must bypass concept tokens: register the identity
        mapped = "".join(tokenizer._byte_encoder[b] for b in token.encode("utf-8"))
        tokenizer._cache[mapped] = [token]


class ConceptExtender(fl.Chain, Adapter[CLIPTextEncoder]):
    """Extend a CLIPTextEncoder vocabulary with textual-inversion concepts
    (concepts.py:78). Inject to activate; add concepts any time."""

    # bookkeeping references into the target tree: never pytree members
    _pytree_ignore = fl.Chain._pytree_ignore | {
        "_token_encoder_parent",
        "_clip_tokenizer_parent",
        "_embedding_extender",
        "_token_extender",
    }

    def __init__(self, target: CLIPTextEncoder) -> None:
        with self.setup_adapter(target):
            super().__init__(target)

        self._ensure_no_nesting()

        try:
            token_encoder, token_encoder_parent = next(target.walk(TokenEncoder))
            self._token_encoder_parent = [token_encoder_parent]
        except StopIteration:
            raise RuntimeError("TokenEncoder not found.")

        try:
            clip_tokenizer, clip_tokenizer_parent = next(target.walk(CLIPTokenizer))
            self._clip_tokenizer_parent = [clip_tokenizer_parent]
        except StopIteration:
            raise RuntimeError("Tokenizer not found.")

        self._embedding_extender = [EmbeddingExtender(token_encoder)]
        self._token_extender = [TokenExtender(clip_tokenizer)]

    def _ensure_no_nesting(self) -> None:
        assert not isinstance(
            self.target.parent, ConceptExtender
        ), "ConceptExtender cannot be nested, add concepts to the injected instance instead."

    @property
    def embedding_extender(self) -> EmbeddingExtender:
        return self._embedding_extender[0]

    @property
    def token_extender(self) -> TokenExtender:
        return self._token_extender[0]

    @property
    def token_encoder_parent(self) -> fl.Chain:
        return self._token_encoder_parent[0]

    @property
    def clip_tokenizer_parent(self) -> fl.Chain:
        return self._clip_tokenizer_parent[0]

    def add_concept(self, token: str, embedding: jax.Array) -> None:
        self.embedding_extender.add_embedding(embedding)
        self.token_extender.add_token(token, self.embedding_extender.num_embeddings - 1)

    def inject(self: "ConceptExtender", parent: fl.Chain | None = None) -> "ConceptExtender":
        self._ensure_no_nesting()
        self.embedding_extender.inject(self.token_encoder_parent)
        self.token_extender.inject(self.clip_tokenizer_parent)
        return super().inject(parent)

    def eject(self) -> None:
        self.embedding_extender.eject()
        self.token_extender.eject()
        super().eject()
