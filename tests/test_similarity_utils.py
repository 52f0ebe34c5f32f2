"""The e2e similarity gate itself is tested: near-identical images must pass
every metric, visibly different images must fail every metric — validating
the thresholds used with the seed-0 random-weight DINOv2 scorer."""

import numpy as np
import pytest

from tests.utils import compute_dinov2_cosine, compute_psnr, compute_ssim, ensure_similar_images


def _base_image(seed: int = 0) -> np.ndarray:
    rs = np.random.RandomState(seed)
    # smooth structured image (random low-freq mixture), not white noise
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w] / h
    img = np.zeros((h, w, 3))
    for _ in range(6):
        fx, fy, ph = rs.uniform(1, 6), rs.uniform(1, 6), rs.uniform(0, 6)
        img += np.stack([np.sin(2 * np.pi * (fx * xx + fy * yy) + ph + c) for c in range(3)], axis=-1)
    img = (img - img.min()) / (img.max() - img.min())
    return img


def test_near_identical_images_pass_envelope() -> None:
    a = _base_image()
    b = np.clip(a + np.random.RandomState(1).randn(*a.shape) * 0.003, 0, 1)
    psnr, ssim, cos = compute_psnr(a, b), compute_ssim(a, b), compute_dinov2_cosine(a, b)
    assert psnr >= 35 and ssim >= 0.98 and cos >= 0.99, (psnr, ssim, cos)
    ensure_similar_images(a, b)  # must not raise


def test_different_images_fail_every_metric() -> None:
    a = _base_image(0)
    b = _base_image(7)
    assert compute_psnr(a, b) < 35
    assert compute_ssim(a, b) < 0.98
    assert compute_dinov2_cosine(a, b) < 0.99
    with pytest.raises(AssertionError):
        ensure_similar_images(a, b)


def test_ssim_matches_known_values() -> None:
    a = _base_image()
    assert compute_ssim(a, a) == pytest.approx(1.0)
    # constant shift: SSIM luminance term penalizes, structure term doesn't zero out
    b = np.clip(a * 0.8, 0, 1)
    s = compute_ssim(a, b)
    assert 0.2 < s < 0.999, s
