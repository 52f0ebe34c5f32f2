from refiners_tpu.foundationals.clip.concepts import ConceptExtender
from refiners_tpu.foundationals.clip.image_encoder import (
    CLIPImageEncoder,
    CLIPImageEncoderG,
    CLIPImageEncoderH,
)
from refiners_tpu.foundationals.clip.text_encoder import (
    CLIPTextEncoder,
    CLIPTextEncoderG,
    CLIPTextEncoderH,
    CLIPTextEncoderL,
)
from refiners_tpu.foundationals.clip.tokenizer import CLIPTokenizer

__all__ = [
    "ConceptExtender",
    "CLIPImageEncoder",
    "CLIPImageEncoderG",
    "CLIPImageEncoderH",
    "CLIPTextEncoder",
    "CLIPTextEncoderG",
    "CLIPTextEncoderH",
    "CLIPTextEncoderL",
    "CLIPTokenizer",
]
