"""On-demand native builds: compile a .cpp from this package with g++ and
load it via ctypes. Artifacts are cached by source hash."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

_SRC_DIR = Path(__file__).resolve().parent


def _cache_dir() -> Path:
    d = Path(os.environ.get("REFINERS_TPU_NATIVE_CACHE", Path(tempfile.gettempdir()) / "refiners_tpu_native"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def load_library(name: str) -> ctypes.CDLL | None:
    """Compile `<name>.cpp` (if needed) and load it. Returns None when no
    C++ toolchain is available."""
    src = _SRC_DIR / f"{name}.cpp"
    code = src.read_bytes()
    digest = hashlib.sha256(code).hexdigest()[:16]
    out = _cache_dir() / f"{name}-{digest}.so"
    if not out.exists():
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(out)]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        return ctypes.CDLL(str(out))
    except OSError:
        return None
