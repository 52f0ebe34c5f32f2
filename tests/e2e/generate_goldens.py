"""Regenerate the committed golden PNGs (run from the repo root).

Run ONLY from a tree whose live reference-parity tier is green
(tests/e2e/test_diffusion_30step.py + the adapter e2e suite) — the goldens
inherit their authority from that verification.

    python tests/e2e/generate_goldens.py [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))  # repo root


def main() -> None:
    jax.config.update("jax_platforms", "cpu")
    from tests.e2e.golden_cfg import GOLDEN_DIR, GOLDENS, to_pil

    GOLDEN_DIR.mkdir(exist_ok=True)
    names = sys.argv[1:] or list(GOLDENS)
    for name in names:
        build, run = GOLDENS[name]
        print(f"generating {name} ...", flush=True)
        image = run(build())
        out = GOLDEN_DIR / f"{name}.png"
        to_pil(image).save(out)
        print(f"  wrote {out}")


if __name__ == "__main__":
    main()
