"""The `fl` namespace: all fluxion layers re-exported.

Reference: /root/reference/src/refiners/fluxion/layers/__init__.py.
"""

from refiners_tpu.fluxion.layers.activations import (
    GLU,
    Activation,
    GeLU,
    GeLUApproximation,
    ReLU,
    Sigmoid,
    SiLU,
)
from refiners_tpu.fluxion.layers.attentions import (
    Attention,
    ScaledDotProductAttention,
    SelfAttention,
    SelfAttention2d,
)
from refiners_tpu.fluxion.layers.basics import (
    Buffer,
    Cos,
    Flatten,
    GetArg,
    Identity,
    Multiply,
    Parameter,
    Permute,
    Reshape,
    Sin,
    Slicing,
    Squeeze,
    Transpose,
    Unflatten,
    Unsqueeze,
)
from refiners_tpu.fluxion.layers.chain import (
    Breakpoint,
    Chain,
    ChainError,
    Concatenate,
    Distribute,
    Lambda,
    Matmul,
    Parallel,
    Passthrough,
    Residual,
    Return,
    ReturnException,
    SetContext,
    Sum,
    UseContext,
)
from refiners_tpu.fluxion.layers.conv import Conv2d, ConvTranspose2d
from refiners_tpu.fluxion.layers.converter import Converter
from refiners_tpu.fluxion.layers.embedding import Embedding
from refiners_tpu.fluxion.layers.linear import Linear, MultiLinear
from refiners_tpu.fluxion.layers.maxpool import MaxPool1d, MaxPool2d
from refiners_tpu.fluxion.layers.module import ContextModule, Module, ModuleTree, WeightedModule
from refiners_tpu.fluxion.layers.norm import GroupNorm, InstanceNorm2d, LayerNorm, LayerNorm2d
from refiners_tpu.fluxion.layers.padding import ReflectionPad2d
from refiners_tpu.fluxion.layers.pixelshuffle import PixelShuffle, PixelUnshuffle
from refiners_tpu.fluxion.layers.sampling import Downsample, Interpolate, Upsample

__all__ = [
    "Activation",
    "GLU",
    "GeLU",
    "GeLUApproximation",
    "ReLU",
    "Sigmoid",
    "SiLU",
    "Attention",
    "ScaledDotProductAttention",
    "SelfAttention",
    "SelfAttention2d",
    "Buffer",
    "Cos",
    "Flatten",
    "GetArg",
    "Identity",
    "Multiply",
    "Parameter",
    "Permute",
    "Reshape",
    "Sin",
    "Slicing",
    "Squeeze",
    "Transpose",
    "Unflatten",
    "Unsqueeze",
    "Breakpoint",
    "Chain",
    "ChainError",
    "Concatenate",
    "Distribute",
    "Lambda",
    "Matmul",
    "Parallel",
    "Passthrough",
    "Residual",
    "Return",
    "ReturnException",
    "SetContext",
    "Sum",
    "UseContext",
    "Conv2d",
    "ConvTranspose2d",
    "Converter",
    "Embedding",
    "Linear",
    "MultiLinear",
    "MaxPool1d",
    "MaxPool2d",
    "ContextModule",
    "Module",
    "ModuleTree",
    "WeightedModule",
    "GroupNorm",
    "InstanceNorm2d",
    "LayerNorm",
    "LayerNorm2d",
    "ReflectionPad2d",
    "PixelShuffle",
    "PixelUnshuffle",
    "Downsample",
    "Interpolate",
    "Upsample",
]
