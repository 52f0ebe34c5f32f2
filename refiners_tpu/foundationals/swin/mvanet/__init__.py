from refiners_tpu.foundationals.swin.mvanet.mvanet import MVANet

__all__ = ["MVANet"]
