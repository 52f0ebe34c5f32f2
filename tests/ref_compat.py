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


def reference_available() -> bool:
    try:
        import refiners  # noqa: F401

        return True
    except Exception:
        return False
