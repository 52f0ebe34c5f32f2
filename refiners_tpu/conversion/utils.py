"""Weight conversion utilities.

Reference: /root/reference/src/refiners/conversion/utils.py (WeightRecipe
:179, Hub :55, Conversion :267). Converts upstream checkpoints
(diffusers/transformers/original repos, torch layouts) into this framework's
state-dict layout. Beyond key renames, every rule carries a layout transform
because our hot layouts differ from torch:

- Linear: (out, in) → (in, out)            [MXU x@W, no transpose at runtime]
- Conv2d: OIHW → HWIO                      [NHWC convs]
- ConvTranspose2d: (in, out, kh, kw) → (kh, kw, in, out)
"""

from __future__ import annotations

import hashlib
import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

TensorOp = Callable[[jax.Array], jax.Array]


def op_identity(x: jax.Array) -> jax.Array:
    return x


def op_linear(x: jax.Array) -> jax.Array:
    """torch Linear weight (out, in) → (in, out)."""
    return jnp.transpose(x)


def op_conv(x: jax.Array) -> jax.Array:
    """torch Conv2d weight OIHW → HWIO."""
    return jnp.transpose(x, (2, 3, 1, 0))


def op_conv_transpose(x: jax.Array) -> jax.Array:
    """torch ConvTranspose2d weight (in, out, kh, kw) → (kh, kw, in, out)."""
    return jnp.transpose(x, (2, 3, 0, 1))


@dataclass
class Rule:
    """One renaming rule: regex over source keys → target template + layout op.

    The template may reference regex groups as ``\\1``/``\\g<name>``. Callable
    templates receive the match object and return the target key (or None to
    skip the key).
    """

    pattern: str
    target: str | Callable[[re.Match[str]], str | None]
    op: TensorOp = op_identity

    def apply(self, key: str) -> tuple[str, TensorOp] | None:
        m = re.fullmatch(self.pattern, key)
        if m is None:
            return None
        if callable(self.target):
            t = self.target(m)
            return (t, self.op) if t is not None else None
        return m.expand(self.target), self.op


@dataclass
class WeightRecipe:
    """Declarative key-translation table (reference utils.py:179).

    Order matters: the first matching rule wins. Keys matching no rule are
    dropped when `strict` is False, or raise otherwise.
    """

    rules: list[Rule] = field(default_factory=list)
    strict: bool = True

    def translate(self, state: dict[str, Any]) -> dict[str, jax.Array]:
        out: dict[str, jax.Array] = {}
        for key, value in state.items():
            hit = None
            for rule in self.rules:
                hit = rule.apply(key)
                if hit is not None:
                    break
            if hit is None:
                if self.strict:
                    raise KeyError(f"no conversion rule for key {key!r}")
                continue
            target, op = hit
            arr = jnp.asarray(np.asarray(value)) if not isinstance(value, jax.Array) else value
            out[target] = op(arr)
        return out


@dataclass
class KeyMapRecipe:
    """Suffix-aware key translation table (reference utils.py:179).

    `key_map` maps source key *stems* (without the ``.weight``/``.bias``
    suffix) to target stems in the reference layout. Unknown keys are dropped.
    The translated dict is still in torch tensor layouts — pipe it through
    `refiners_compat.convert_refiners_state_dict` to reach our layouts.
    """

    key_map: dict[str, str]
    key_prefix: str = ""
    key_aliases: dict[str, str] = field(default_factory=dict)
    tensor_reshapes: dict[str, tuple[int, ...]] = field(default_factory=dict)

    def translate(self, state: dict[str, Any]) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for key, value in state.items():
            suffix = next(s for s in (".weight", ".bias", "") if key.endswith(s))
            stem = key.removesuffix(suffix).removeprefix(self.key_prefix)
            stem = self.key_aliases.get(stem, stem)
            target = self.key_map.get(stem)
            if target is None:
                continue
            out[target + suffix] = value
        for key, shape in self.tensor_reshapes.items():
            if key in out:
                out[key] = np.asarray(out[key]).reshape(shape)
        return out

    def convert(self, state: dict[str, Any], target: Any, strict: bool = True) -> dict[str, jax.Array]:
        """Translate keys, then transform tensor layouts against `target`."""
        from refiners_tpu.conversion.refiners_compat import convert_refiners_state_dict

        return convert_refiners_state_dict(self.translate(state), target, strict=strict)


def convert_state_dict(
    state: dict[str, Any], recipe: WeightRecipe, dtype: jnp.dtype | None = None
) -> dict[str, jax.Array]:
    converted = recipe.translate(state)
    if dtype is not None:
        converted = {
            k: v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v for k, v in converted.items()
        }
    return converted


@dataclass
class Hub:
    """Weight registry entry: remote URL + sha256 + local cache path
    (reference utils.py:55-177). Downloads are attempted only when the
    environment allows egress; otherwise the local path must already exist."""

    repo_id: str
    filename: str
    expected_sha256: str | None = None
    revision: str = "main"
    download_url: str | None = None

    @property
    def url(self) -> str:
        if self.download_url is not None:
            return self.download_url
        return f"https://huggingface.co/{self.repo_id}/resolve/{self.revision}/{self.filename}"

    @classmethod
    def cache_dir(cls) -> Path:
        return Path(os.environ.get("REFINERS_TPU_WEIGHTS", Path.home() / ".cache" / "refiners_tpu"))

    @property
    def local_path(self) -> Path:
        return self.cache_dir() / self.repo_id / self.filename

    def exists_locally(self) -> bool:
        return self.local_path.exists()

    def check_sha256(self) -> bool:
        if self.expected_sha256 is None:
            return True
        h = hashlib.sha256()
        with open(self.local_path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest() == self.expected_sha256

    def download(self, force: bool = False) -> Path:
        if self.exists_locally() and not force:
            return self.local_path
        import urllib.request

        self.local_path.parent.mkdir(parents=True, exist_ok=True)
        try:
            urllib.request.urlretrieve(self.url, self.local_path)
        except Exception as e:  # zero-egress environments
            raise RuntimeError(
                f"cannot download {self.url}; place the file at {self.local_path} manually"
            ) from e
        if not self.check_sha256():
            self.local_path.unlink()
            raise RuntimeError(f"sha256 mismatch for {self.local_path}")
        return self.local_path


@dataclass
class Conversion:
    """source Hub → recipe → dtype cast → safetensors (reference utils.py:267)."""

    source: Hub
    target: Hub
    recipe: WeightRecipe
    dtype: Any = None

    def run(self) -> Path:
        from refiners_tpu.fluxion.utils import load_from_safetensors, load_tensors, save_to_safetensors

        src = self.source.download()
        state = load_from_safetensors(src) if src.suffix == ".safetensors" else load_tensors(src)
        converted = convert_state_dict(state, self.recipe, dtype=self.dtype)
        self.target.local_path.parent.mkdir(parents=True, exist_ok=True)
        save_to_safetensors(self.target.local_path, converted)
        return self.target.local_path
