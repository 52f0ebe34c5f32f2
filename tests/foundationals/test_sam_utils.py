"""SAM preprocessing utils parity vs the reference
(tests/foundationals/segment_anything/test_utils.py)."""

import numpy as np
import pytest
from PIL import Image

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")

RES = 1024


def test_compute_scaled_size() -> None:
    from refiners.foundationals.segment_anything.utils import compute_scaled_size as ref_fn

    from refiners_tpu.foundationals.segment_anything.utils import compute_scaled_size

    for size in [(333, 512), (1024, 1024), (2048, 300), (7, 9)]:
        assert compute_scaled_size(size, RES) == ref_fn(size, RES)


def test_image_to_scaled_tensor() -> None:
    import torch
    from refiners.foundationals.segment_anything.utils import image_to_scaled_tensor as ref_fn

    from refiners_tpu.foundationals.segment_anything.utils import (
        compute_scaled_size,
        image_to_scaled_tensor,
    )

    rs = np.random.RandomState(0)
    image = Image.fromarray(rs.randint(0, 255, (120, 200, 3), dtype=np.uint8))
    scaled = compute_scaled_size((image.height, image.width), RES)
    got = np.asarray(image_to_scaled_tensor(image, scaled))
    expected = ref_fn(image, scaled).numpy()
    # ours is NHWC, reference NCHW
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), expected, atol=1e-4)

    gray = Image.fromarray(rs.randint(0, 255, (120, 200), dtype=np.uint8), mode="L")
    got_g = np.asarray(image_to_scaled_tensor(gray, scaled))
    expected_g = ref_fn(gray, scaled).numpy()
    np.testing.assert_allclose(got_g.transpose(0, 3, 1, 2), expected_g, atol=1e-4)


def test_preprocess_and_pad() -> None:
    import torch
    from refiners.foundationals.segment_anything.utils import (
        pad_image_tensor as ref_pad,
        preprocess_image as ref_pre,
    )

    from refiners_tpu.foundationals.segment_anything.utils import (
        compute_scaled_size,
        pad_image_tensor,
        preprocess_image,
    )

    rs = np.random.RandomState(1)
    image = Image.fromarray(rs.randint(0, 255, (96, 160, 3), dtype=np.uint8))
    got = np.asarray(preprocess_image(image, RES))
    expected = ref_pre(image, RES).numpy()
    assert got.shape == (1, RES, RES, 3)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), expected, atol=2e-4)

    scaled = compute_scaled_size((96, 160), RES)
    x = rs.rand(1, scaled[0], scaled[1], 3).astype(np.float32)
    got_p = np.asarray(pad_image_tensor(jnp_asarray(x), scaled, RES))
    expected_p = ref_pad(torch.from_numpy(x.transpose(0, 3, 1, 2)), scaled, RES).numpy()
    np.testing.assert_allclose(got_p.transpose(0, 3, 1, 2), expected_p, atol=1e-6)


def test_normalize_coordinates() -> None:
    import torch
    from refiners.foundationals.segment_anything.utils import normalize_coordinates as ref_fn

    from refiners_tpu.foundationals.segment_anything.utils import normalize_coordinates

    coords = np.asarray([[[100.0, 200.0], [50.0, 60.0]]], dtype=np.float32)
    got = np.asarray(normalize_coordinates(jnp_asarray(coords), (333, 512), RES))
    expected = ref_fn(torch.from_numpy(coords.copy()), (333, 512), RES).numpy()
    np.testing.assert_allclose(got, expected, atol=1e-5)


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)
