"""CLIP BPE tokenizer — host-side (never traced; SURVEY §7 hard part (e)).

Behavior-compatible with the reference tokenizer
(/root/reference/src/refiners/foundationals/clip/tokenizer.py:13): byte-level
BPE over the standard OpenAI CLIP merge table, SOT/EOT wrapping, fixed-length
padded int32 output. The merge table is *data*, not code: it is looked up at
runtime from `vocabulary_path`, the `REFINERS_TPU_CLIP_VOCAB` env var, or
known local locations (we do not vendor the file).
"""

from __future__ import annotations

import gzip
import os
import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import refiners_tpu.fluxion.layers as fl

_DEFAULT_VOCAB_LOCATIONS = [
    Path(__file__).resolve().parent / "bpe_simple_vocab_16e6.txt.gz",
    Path("/root/reference/src/refiners/foundationals/clip/bpe_simple_vocab_16e6.txt.gz"),
]


def _find_vocab(path: str | Path | None) -> Path:
    candidates = []
    if path is not None:
        candidates.append(Path(path))
    env = os.environ.get("REFINERS_TPU_CLIP_VOCAB")
    if env:
        candidates.append(Path(env))
    candidates.extend(_DEFAULT_VOCAB_LOCATIONS)
    for c in candidates:
        if c.exists():
            return c
    raise FileNotFoundError(
        "CLIP BPE vocabulary not found; set REFINERS_TPU_CLIP_VOCAB or pass vocabulary_path "
        f"(tried {[str(c) for c in candidates]})"
    )


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2-style reversible byte→printable-unicode map."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping: dict[int, str] = {b: chr(b) for b in printable}
    offset = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + offset)
            offset += 1
    return mapping


class CLIPTokenizer(fl.Module):
    """Byte-level BPE tokenizer producing (1, sequence_length) int32 ids."""

    # host-side tables: excluded from the pytree so flatten/hash stays O(1)
    _pytree_ignore = fl.Module._pytree_ignore | {
        "_byte_encoder",
        "_encoder",
        "_bpe_ranks",
        "_cache",
        "_pattern",
        "_native",
    }

    def __init__(
        self,
        vocabulary_path: str | Path | None = None,
        sequence_length: int = 77,
        start_of_text_token_id: int = 49406,
        end_of_text_token_id: int = 49407,
        pad_token_id: int = 49407,
    ) -> None:
        super().__init__()
        vocab_file = _find_vocab(vocabulary_path)
        self.vocabulary_path = str(vocab_file)
        self.sequence_length = sequence_length
        self.start_of_text_token_id = start_of_text_token_id
        self.end_of_text_token_id = end_of_text_token_id
        self.pad_token_id = pad_token_id

        self._byte_encoder = _bytes_to_unicode()
        raw = gzip.open(vocab_file).read().decode("utf-8").split("\n")
        # CLIP vocab file: header line, then 49152-256-2 merge lines
        merges = [tuple(line.split()) for line in raw[1 : 49152 - 256 - 2 + 1]]
        base = list(self._byte_encoder.values())
        vocab = base + [f"{tok}</w>" for tok in base] + ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self._encoder: dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self._bpe_ranks: dict[tuple[str, str], int] = {m: i for i, m in enumerate(merges)}
        self._cache: dict[str, list[str]] = {}
        # ASCII-only token splitter (as in the reference; unicode text is
        # still representable through the byte fallback of BPE)
        self._pattern = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|(?:[^\s\w]|_)+",
            flags=re.IGNORECASE,
        )
        # optional native (C++) merge engine; pure-Python fallback otherwise
        self._native = None
        try:
            from refiners_tpu.native.bpe_binding import NativeBPE

            byte_decoder = {v: k for k, v in self._byte_encoder.items()}
            self._native = NativeBPE(self._encoder, self._bpe_ranks, byte_decoder)
        except Exception:
            pass

    # -- BPE ----------------------------------------------------------------

    def _bpe(self, token: str) -> list[str]:
        if token in self._cache:
            return self._cache[token]
        word: list[str] = list(token[:-1]) + [token[-1] + "</w>"]
        while len(word) > 1:
            pairs = [(word[i], word[i + 1]) for i in range(len(word) - 1)]
            best = min(pairs, key=lambda p: self._bpe_ranks.get(p, 1 << 30))
            if best not in self._bpe_ranks:
                break
            first, second = best
            merged: list[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self._cache[token] = word
        return word

    def encode_str(self, text: str) -> list[int]:
        """Text → BPE token ids, without special tokens."""
        text = re.sub(r"\s+", " ", text.lower()).strip()
        chunks = self._pattern.findall(text)
        if self._native is not None and not self._cache:
            # fast path: one FFI call for the whole prompt
            return self._native.encode_words([c.encode("utf-8") for c in chunks])
        ids: list[int] = []
        for chunk in chunks:
            mapped = "".join(self._byte_encoder[b] for b in chunk.encode("utf-8"))
            if mapped in self._cache:  # includes concept tokens
                ids.extend(self._encoder[sub] for sub in self._cache[mapped])
            elif self._native is not None:
                ids.extend(self._native.encode_word(chunk.encode("utf-8")))
            else:
                ids.extend(self._encoder[sub] for sub in self._bpe(mapped))
        return ids

    def encode(self, text: str, max_length: int | None = None) -> jax.Array:
        """Reference-compatible: SOT + ids + EOT as a 1-D int32 array."""
        ids = self.encode_str(text)
        if max_length is not None:
            assert max_length >= 2
            ids = ids[: max_length - 2]
        return jnp.asarray([self.start_of_text_token_id, *ids, self.end_of_text_token_id], dtype=jnp.int32)

    def tokenize_str(self, text: str) -> jax.Array:
        tokens = self.encode(text=text, max_length=self.sequence_length)
        n = tokens.shape[0]
        assert n <= self.sequence_length, f"Text is too long ({len(text)})"
        padded = np.full((1, self.sequence_length), self.pad_token_id, dtype=np.int32)
        padded[0, :n] = np.asarray(tokens)
        return jnp.asarray(padded)

    def forward(self, text: str | list[str]) -> jax.Array:
        if isinstance(text, str):
            return self.tokenize_str(text)
        assert isinstance(text, list), f"Expected type `str` or `list[str]`, got {type(text)}"
        return jnp.concatenate([self.tokenize_str(t) for t in text], axis=0)
