"""Tensor/image utility semantics (reference tests/fluxion/test_utils.py)."""

import jax.numpy as jnp
import numpy as np
from PIL import Image

from refiners_tpu.fluxion.utils import (
    gaussian_blur,
    image_to_tensor,
    normalize,
    summarize_tensor,
    tensor_to_image,
)


def test_image_to_tensor_roundtrip() -> None:
    rs = np.random.RandomState(0)
    img = Image.fromarray(rs.randint(0, 255, (24, 16, 3), dtype=np.uint8))
    t = image_to_tensor(img)
    assert t.shape == (1, 24, 16, 3)  # NHWC, [0, 1]
    assert float(t.min()) >= 0.0 and float(t.max()) <= 1.0
    back = tensor_to_image(t)
    assert back.size == img.size
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def test_image_to_tensor_grayscale_and_rgba() -> None:
    gray = Image.new("L", (8, 6), 100)
    t = image_to_tensor(gray)
    assert t.shape == (1, 6, 8, 1)
    rgba = Image.new("RGBA", (8, 6), (10, 20, 30, 255))
    t = image_to_tensor(rgba)
    assert t.shape == (1, 6, 8, 4)


def test_normalize() -> None:
    x = jnp.ones((1, 4, 4, 3))
    out = normalize(x, mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.asarray(out), np.ones((1, 4, 4, 3)), atol=1e-6)


def test_gaussian_blur_matches_reference() -> None:
    from tests.ref_compat import reference_available

    if not reference_available():
        import pytest

        pytest.skip("reference package unavailable")
    import torch
    from refiners.fluxion.utils import gaussian_blur as ref_blur

    rs = np.random.RandomState(1)
    x = rs.rand(1, 9, 11, 3).astype(np.float32)
    got = np.asarray(gaussian_blur(jnp.asarray(x), kernel_size=5, sigma=1.3))
    expected = ref_blur(torch.from_numpy(x.transpose(0, 3, 1, 2)), kernel_size=5, sigma=1.3).numpy()
    np.testing.assert_allclose(got, expected.transpose(0, 2, 3, 1), atol=1e-5)


def test_summarize_tensor() -> None:
    s = summarize_tensor(jnp.asarray([[1.0, 2.0, 3.0]]))
    for token in ("shape=(1, 3)", "min=1.0", "max=3.0", "mean=2.0"):
        assert token in s, s
    # integer and size-1 tensors must not crash (no std/quantiles)
    summarize_tensor(jnp.asarray([3]))
    summarize_tensor(jnp.asarray([1.5]))
