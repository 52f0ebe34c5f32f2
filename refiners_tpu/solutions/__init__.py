from refiners_tpu.solutions.box_segmenter import BoundingBox, BoxSegmenter

__all__ = ["BoundingBox", "BoxSegmenter"]
