"""predict_pipelined returns exactly what per-request predict returns.

The pipelined serving loop (segment_anything/model.py predict_pipelined) is a
TPU-serving addition with no reference counterpart: it enqueues every
request's device programs before any readback so transfers overlap compute.
Numerically it must be a no-op — same programs, same order per request.
"""

import numpy as np
from PIL import Image


def test_predict_pipelined_matches_predict() -> None:
    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.segment_anything import (
        MaskDecoder,
        MaskEncoder,
        PointEncoder,
        SAMViT,
        SegmentAnything,
    )

    manual_seed(3)
    sam = SegmentAnything(
        image_encoder=SAMViT(embedding_dim=64, num_layers=2, num_heads=4, global_attention_indices=(1,)),
        point_encoder=PointEncoder(),
        mask_encoder=MaskEncoder(),
        mask_decoder=MaskDecoder(multimask_output=False),
    )

    rs = np.random.RandomState(7)
    image_a = Image.fromarray(rs.randint(0, 255, (256, 320, 3), dtype=np.uint8))
    image_b = Image.fromarray(rs.randint(0, 255, (200, 200, 3), dtype=np.uint8))
    embedding_a = sam.compute_image_embedding(image_a)

    # mixed request shapes: raw image + point, precomputed embedding + box,
    # second image + fg/bg points — each compiles/reuses its own prompt
    # specialization exactly as serial predict does
    inputs = [image_a, embedding_a, image_b]
    prompts = [
        dict(foreground_points=[(120.0, 80.0)]),
        dict(box_points=[[(10.0, 10.0), (300.0, 240.0)]]),
        dict(foreground_points=[(50.0, 50.0)], background_points=[(150.0, 150.0)]),
    ]

    pipelined = sam.predict_pipelined(inputs, prompts, binarize=False)

    for (image, prompt), (masks_p, iou_p, low_p) in zip(zip(inputs, prompts), pipelined, strict=True):
        masks_s, iou_s, low_s = sam.predict(image, binarize=False, **prompt)
        np.testing.assert_array_equal(masks_p, np.asarray(masks_s))
        np.testing.assert_array_equal(iou_p, np.asarray(iou_s))
        np.testing.assert_array_equal(low_p, np.asarray(low_s))
