from refiners_tpu.foundationals.swin.swin_transformer import SwinTransformer

__all__ = ["SwinTransformer"]
