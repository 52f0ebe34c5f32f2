"""Reference-free e2e gate: full pipelines vs committed golden PNGs.

The live tier (test_diffusion_30step.py, test_adapter_pipeline_e2e.py)
regenerates the torch reference and is the stricter check — but it skips
entirely when /root/reference is absent. These tests always run: same seeded
weights (threefry is platform-stable), same prompts/noise, asserted against
goldens committed from a live-verified build (see golden_cfg.py docstring).
A failure here means the pipeline's numerics drifted from the state that
passed reference parity.
"""

import pytest

from tests.e2e.golden_cfg import GOLDEN_DIR, GOLDENS, to_pil
from tests.utils import ensure_similar_images


def _check(name: str) -> None:
    golden_path = GOLDEN_DIR / f"{name}.png"
    assert golden_path.exists(), (
        f"missing committed golden {golden_path}; regenerate with "
        f"`python tests/e2e/generate_goldens.py {name}` from a live-verified tree"
    )
    from PIL import Image

    build, run = GOLDENS[name]
    image = to_pil(run(build()))
    golden = Image.open(golden_path)
    ensure_similar_images(image, golden, min_psnr=35, min_ssim=0.98, min_dino_cosine=0.99)


def test_sd15_reduced_10step_golden() -> None:
    _check("sd15_reduced_10step_128")


@pytest.mark.slow
def test_sd15_full_30step_golden() -> None:
    _check("sd15_full_30step_256")


# The adapter-zoo golden tier (VERDICT r3 item 5): trajectory-level,
# reference-free coverage of every §2.8 adapter pipeline plus SDXL at 30
# steps. Slow (full-width models on CPU), but unlike the live zoo tier these
# never skip when /root/reference is absent.
_ZOO_GOLDENS = sorted(
    name for name in GOLDENS if name not in ("sd15_reduced_10step_128", "sd15_full_30step_256")
)


@pytest.mark.slow
@pytest.mark.parametrize("name", _ZOO_GOLDENS)
def test_zoo_golden(name: str) -> None:
    import gc

    _check(name)
    gc.collect()  # full-width SD15/SDXL trees — release between params
