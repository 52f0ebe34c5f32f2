"""`get_weights` CLI: download + convert model weights.

Reference: /root/reference/src/refiners/conversion/cli.py:27.
"""

from __future__ import annotations

import argparse
import sys

from refiners_tpu.conversion.models.registry import REGISTRY


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="get_weights",
        description="Download and convert model weights into refiners-tpu layouts.",
    )
    parser.add_argument("models", nargs="*", help="model names to convert (default: list available)")
    parser.add_argument("--output", "-o", default=None, help="output path (single model only)")
    parser.add_argument("--all", action="store_true", help="convert every registered model")
    args = parser.parse_args(argv)

    names = list(REGISTRY) if args.all else args.models
    if not names:
        print("available models:")
        for name, entry in REGISTRY.items():
            print(f"  {name:36s} {entry.description}")
        return 0

    for name in names:
        if name not in REGISTRY:
            print(f"unknown model {name!r}; run with no arguments to list", file=sys.stderr)
            return 1
        out = REGISTRY[name].convert(args.output if len(names) == 1 else None)
        print(f"{name} → {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
