"""BoxSegmenter solution: crop/margin/paste geometry and the predict path.

Reference anchor: /root/reference/src/refiners/solutions/box_segmenter.py
(the reference e2e validates masks with pretrained weights; offline we pin
the box geometry exactly and run the real MVANet in the slow tier)."""

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from refiners_tpu.solutions.box_segmenter import BoxSegmenter


@pytest.fixture(scope="module")
def segmenter() -> BoxSegmenter:
    seg = BoxSegmenter.__new__(BoxSegmenter)  # skip MVANet build for geometry tests
    seg.margin = 0.05
    return seg


def test_add_margin(segmenter: BoxSegmenter) -> None:
    assert segmenter.add_margin((100, 100, 300, 200)) == (90, 95, 310, 205)
    segmenter.margin = 0.0
    assert segmenter.add_margin((10, 10, 20, 20)) == (10, 10, 20, 20)
    segmenter.margin = 0.05


def test_crop_pad_inside(segmenter: BoxSegmenter) -> None:
    img = Image.fromarray((np.arange(100 * 100 * 3) % 255).astype(np.uint8).reshape(100, 100, 3))
    out = BoxSegmenter.crop_pad(img, (10, 20, 60, 70))
    assert out.size == (50, 50)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img)[20:70, 10:60])


def test_crop_pad_out_of_bounds_pads_black(segmenter: BoxSegmenter) -> None:
    img = Image.new("RGB", (40, 40), (200, 10, 10))
    out = BoxSegmenter.crop_pad(img, (-10, -10, 50, 50))
    assert out.size == (60, 60)
    arr = np.asarray(out)
    np.testing.assert_array_equal(arr[:10, :, :], 0)  # top padding is black
    np.testing.assert_array_equal(arr[10:50, 10:50], np.asarray(img))


def test_run_pastes_prediction_at_box(segmenter: BoxSegmenter, monkeypatch: pytest.MonkeyPatch) -> None:
    """run() must paste the (resized) prediction exactly at the margin-grown
    box and leave the rest of the canvas empty."""

    def fake_predict(img: Image.Image) -> Image.Image:
        return Image.new("L", img.size, 255)  # all-foreground mask

    monkeypatch.setattr(segmenter, "predict", fake_predict)
    segmenter.margin = 0.0
    image = Image.new("RGB", (100, 80))
    mask = segmenter.run(image, box_prompt=(20, 10, 60, 50))
    assert mask.size == (100, 80)
    arr = np.asarray(mask)
    np.testing.assert_array_equal(arr[10:50, 20:60], 255)
    assert arr.sum() == 255 * 40 * 40  # nothing outside the box
    segmenter.margin = 0.05


@pytest.mark.slow
def test_box_segmenter_full_model_smoke() -> None:
    """Real (random-weight) MVANet: output is a mask of the input size with
    finite probabilities."""
    from refiners_tpu.fluxion import manual_seed

    manual_seed(0)
    seg = BoxSegmenter(margin=0.05)
    image = Image.fromarray((np.random.RandomState(0).rand(128, 160, 3) * 255).astype(np.uint8))
    mask = seg(image, box_prompt=(20, 20, 120, 100))
    assert mask.size == image.size
    assert mask.mode == "L"
