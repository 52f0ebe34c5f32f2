"""Native (C++) runtime components.

Built on demand with g++ into a per-user cache; every consumer has a pure
Python fallback, so the native layer is an accelerator, never a dependency.
"""

from refiners_tpu.native.build import load_library

__all__ = ["load_library"]
