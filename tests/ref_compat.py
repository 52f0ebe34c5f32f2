"""Import helper for the read-only reference implementation at /root/reference.

Used by parity tests ONLY: we run the reference (torch, CPU) side by side with
our JAX implementation and compare outputs numerically.
"""

import importlib.metadata as _md
import sys

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

_orig_version = _md.version


def _patched_version(name: str) -> str:
    if name == "refiners":
        return "0.0.0"
    return _orig_version(name)


_md.version = _patched_version

_orig_requires = _md.requires


def _patched_requires(name: str):
    if name == "refiners":
        # reference conversion/__init__.py gates on the "conversion" extra;
        # report no requirements so the import proceeds
        return []
    return _orig_requires(name)


_md.requires = _patched_requires

# reference conversion recipes import the official `segment_anything` package,
# which is not installed; a permissive stub lets the recipe tables import
import types as _types


def _stub_module(name: str) -> None:
    if name in sys.modules:
        return
    mod = _types.ModuleType(name)
    def _getattr(attr: str):
        if attr.startswith("__"):
            raise AttributeError(attr)
        if attr[0].islower():
            return lambda *a, **k: None
        import torch.nn as _nn

        return type(attr, (_nn.Module,), {})

    mod.__getattr__ = _getattr  # type: ignore[attr-defined]
    sys.modules[name] = mod


_stub_module("segment_anything")
_stub_module("segment_anything.modeling")
_stub_module("segment_anything.modeling.common")


def reference_available() -> bool:
    try:
        import refiners  # noqa: F401

        return True
    except Exception:
        return False
