"""SAM parity vs the reference (random weights, CPU, reduced-size ViT)."""

import numpy as np
import pytest
import torch
from PIL import Image

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


def _small_models(seed: int):
    """Matching (reference, ours) reduced SAM pairs with converted weights."""
    torch.manual_seed(seed)
    from refiners.foundationals.segment_anything.image_encoder import SAMViT as RefViT
    from refiners.foundationals.segment_anything.mask_decoder import MaskDecoder as RefMaskDecoder
    from refiners.foundationals.segment_anything.model import SegmentAnything as RefSAM
    from refiners.foundationals.segment_anything.prompt_encoder import (
        MaskEncoder as RefMaskEncoder,
        PointEncoder as RefPointEncoder,
    )

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.segment_anything import (
        MaskDecoder,
        MaskEncoder,
        PointEncoder,
        SAMViT,
        SegmentAnything,
    )

    ref = RefSAM(
        image_encoder=RefViT(embedding_dim=64, num_layers=2, num_heads=4, global_attention_indices=(1,)),
        point_encoder=RefPointEncoder(),
        mask_encoder=RefMaskEncoder(),
        mask_decoder=RefMaskDecoder(multimask_output=False),
    ).eval()
    ours = SegmentAnything(
        image_encoder=SAMViT(embedding_dim=64, num_layers=2, num_heads=4, global_attention_indices=(1,)),
        point_encoder=PointEncoder(),
        mask_encoder=MaskEncoder(),
        mask_decoder=MaskDecoder(multimask_output=False),
    )
    load_reference_state_dict(ours, {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    return ref, ours


@pytest.mark.slow
def test_sam_predict_matches_reference() -> None:
    ref, ours = _small_models(seed=0)

    rs = np.random.RandomState(0)
    image = Image.fromarray(rs.randint(0, 255, (333, 512, 3), dtype=np.uint8))

    with torch.no_grad():
        ref_masks, ref_iou, ref_low = ref.predict(image, foreground_points=[(100.0, 100.0)], binarize=False)
    our_masks, our_iou, our_low = ours.predict(image, foreground_points=[(100.0, 100.0)], binarize=False)

    np.testing.assert_allclose(np.asarray(our_low), ref_low.numpy(), atol=5e-3)
    np.testing.assert_allclose(np.asarray(our_iou), ref_iou.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(our_masks), ref_masks.numpy(), atol=2e-2)


@pytest.mark.slow
def test_sam_box_prompt_matches_reference() -> None:
    ref, ours = _small_models(seed=1)

    rs = np.random.RandomState(1)
    image = Image.fromarray(rs.randint(0, 255, (256, 256, 3), dtype=np.uint8))
    box = [[(32.0, 32.0), (200.0, 180.0)]]

    with torch.no_grad():
        ref_masks, ref_iou, _ = ref.predict(image, box_points=box, binarize=True)
    our_masks, our_iou, _ = ours.predict(image, box_points=box, binarize=True)

    np.testing.assert_allclose(np.asarray(our_iou), ref_iou.numpy(), atol=1e-3)
    # binary masks: compare IoU of the binarized outputs
    a = np.asarray(our_masks)
    b = ref_masks.numpy()
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    assert union == 0 or inter / union > 0.99


@pytest.mark.slow
def test_hq_sam_adapter_matches_reference() -> None:
    from refiners.foundationals.segment_anything.hq_sam import HQSAMAdapter as RefHQ

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.segment_anything.hq_sam import HQSAMAdapter

    ref, ours = _small_models(seed=2)
    torch.manual_seed(7)
    RefHQ(ref).inject()
    HQSAMAdapter(ours).inject()
    # post-injection transfer: covers the HQ token, HQ feature convs and MLP
    load_reference_state_dict(ours, {k: v.detach().numpy() for k, v in ref.state_dict().items()})

    rs = np.random.RandomState(2)
    image = Image.fromarray(rs.randint(0, 255, (256, 256, 3), dtype=np.uint8))

    with torch.no_grad():
        ref_masks, ref_iou, ref_low = ref.predict(image, foreground_points=[(120.0, 120.0)], binarize=False)
    our_masks, our_iou, our_low = ours.predict(image, foreground_points=[(120.0, 120.0)], binarize=False)

    assert our_masks.shape == tuple(ref_masks.shape)
    np.testing.assert_allclose(np.asarray(our_low), ref_low.numpy(), atol=5e-3)
    np.testing.assert_allclose(np.asarray(our_masks), ref_masks.numpy(), atol=2e-2)
