"""Image-similarity envelope for e2e tests.

Port of the reference's `ensure_similar_images` gate
(/root/reference/tests/utils.py:46-62): PSNR **and** SSIM **and** DINOv2
embedding cosine must all clear their thresholds. Offline difference: the
reference scores DINOv2 cosine with pretrained weights; here the embedding
network is our DINOv2-small with a fixed random seed — still a deep,
structure-sensitive perceptual hash (identical inputs → cosine 1.0, unrelated
images decorrelate), just not semantically calibrated. Thresholds for the
random-weight metric were validated against perturbed/unrelated image pairs.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def image_to_array(img: Image.Image | np.ndarray) -> np.ndarray:
    """→ float64 (H, W, C) in [0, 1]."""
    if isinstance(img, Image.Image):
        arr = np.asarray(img.convert("RGB"), dtype=np.float64) / 255.0
    else:
        arr = np.asarray(img, dtype=np.float64)
        if arr.ndim == 4:
            arr = arr[0]
        if arr.shape[0] in (1, 3) and arr.shape[0] < arr.shape[-1]:
            arr = arr.transpose(1, 2, 0)
        if arr.min() < -0.25:  # [-1, 1] → [0, 1]
            arr = (arr + 1.0) / 2.0
        arr = np.clip(arr, 0.0, 1.0)
    return arr


def compute_psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return 100.0 if mse == 0 else float(10 * np.log10(1.0 / mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _filter2d_sep(img: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Separable 'valid' gaussian filter over (H, W[, C])."""
    from numpy.lib.stride_tricks import sliding_window_view

    n = w.size
    out = sliding_window_view(img, n, axis=0) @ w  # (H-n+1, W, C)
    out = sliding_window_view(out, n, axis=1) @ w  # (H-n+1, W-n+1, C)
    return out


def compute_ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM (Wang et al. 2004): 11×11 gaussian window, K1/K2 defaults —
    matching skimage/reference semantics on [0, 1] images."""
    assert a.shape == b.shape, f"{a.shape} vs {b.shape}"
    w = _gaussian_window()
    c1, c2 = 0.01**2, 0.03**2
    mu_a = _filter2d_sep(a, w)
    mu_b = _filter2d_sep(b, w)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = _filter2d_sep(a * a, w) - mu_aa
    sigma_bb = _filter2d_sep(b * b, w) - mu_bb
    sigma_ab = _filter2d_sep(a * b, w) - mu_ab
    ssim_map = ((2 * mu_ab + c1) * (2 * sigma_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sigma_aa + sigma_bb + c2)
    )
    return float(ssim_map.mean())


_dino = None


def _dinov2_embedding(arr: np.ndarray) -> np.ndarray:
    """Token-centered patch embedding from a seed-0 random-weight
    DINOv2-small at 224².

    Random-weight CLS embeddings concentrate (cosine ≈ 1 for ANY pair of
    images — measured 0.9999 on unrelated images); patch tokens centered by
    their own mean keep local structure and discriminate (unrelated ≈ 0.84,
    near-identical ≈ 0.99997), so the reference's 0.99 threshold carries
    over meaningfully."""
    global _dino
    import jax.numpy as jnp

    from refiners_tpu.fluxion import manual_seed

    if _dino is None:
        from refiners_tpu.foundationals.dinov2 import DINOv2_small

        manual_seed(0)
        _dino = DINOv2_small()
    # bilinear resize to 224² on the uint8 image, normalized like dinov2.preprocess
    img = Image.fromarray((arr * 255).astype(np.uint8)).resize((224, 224), Image.BILINEAR)
    x = np.asarray(img, dtype=np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (x - mean) / std
    out = np.asarray(_dino(jnp.asarray(x[None])))[0]
    tokens = out[1:]  # drop CLS
    tokens = tokens - tokens.mean(axis=0, keepdims=True)
    return tokens.ravel()


def compute_dinov2_cosine(a: np.ndarray, b: np.ndarray) -> float:
    ea, eb = _dinov2_embedding(a), _dinov2_embedding(b)
    return float(np.dot(ea, eb) / (np.linalg.norm(ea) * np.linalg.norm(eb) + 1e-12))


def ensure_similar_images(
    img_a: Image.Image | np.ndarray,
    img_b: Image.Image | np.ndarray,
    min_psnr: float = 35.0,
    min_ssim: float = 0.98,
    min_dino_cosine: float = 0.99,
) -> None:
    a, b = image_to_array(img_a), image_to_array(img_b)
    psnr = compute_psnr(a, b)
    ssim = compute_ssim(a, b)
    cos = compute_dinov2_cosine(a, b)
    assert psnr >= min_psnr and ssim >= min_ssim and cos >= min_dino_cosine, (
        f"images are not similar enough: PSNR={psnr:.2f} (min {min_psnr}), "
        f"SSIM={ssim:.4f} (min {min_ssim}), DINOv2-cos={cos:.4f} (min {min_dino_cosine})"
    )
