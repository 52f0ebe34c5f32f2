"""ModelConverter autotracing test, mirroring
/root/reference/tests/fluxion/test_model_converter.py (toy two-impl model)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.conversion.model_converter import ConversionStage, ModelConverter


class SourceNet(nn.Module):
    """Toy torch model with an idiosyncratic structure."""

    def __init__(self) -> None:
        super().__init__()
        self.embed = nn.Embedding(10, 16)
        self.proj_in = nn.Linear(16, 32)
        self.norm = nn.LayerNorm(32)
        self.blocks = nn.ModuleList([nn.Linear(32, 32) for _ in range(3)])
        self.proj_out = nn.Linear(32, 4)

    def forward(self, ids: torch.Tensor) -> torch.Tensor:
        x = self.proj_in(self.embed(ids))
        x = self.norm(x)
        for block in self.blocks:
            x = torch.relu(block(x))
        return self.proj_out(x)


class TargetNet(fl.Chain):
    """Same computation, declarative refiners-tpu structure."""

    def __init__(self) -> None:
        super().__init__(
            fl.Embedding(10, 16),
            fl.Linear(16, 32),
            fl.LayerNorm(32),
            *(fl.Chain(fl.Linear(32, 32), fl.ReLU()) for _ in range(3)),
            fl.Linear(32, 4),
        )


def test_model_converter_toy_model() -> None:
    torch.manual_seed(0)
    source = SourceNet().eval()
    target = TargetNet()

    ids = torch.tensor([[1, 2, 3, 4]])
    converter = ModelConverter(source_model=source, target_model=target, verbose=False)
    assert converter.run(source_args=(ids,), target_args=(jnp.asarray(ids.numpy()),))
    assert converter.stage == ConversionStage.MODELS_OUTPUT_AGREE

    with torch.no_grad():
        expected = source(ids).numpy()
    got = np.asarray(target(jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_model_converter_detects_mismatch() -> None:
    torch.manual_seed(1)
    source = SourceNet().eval()
    target = fl.Chain(fl.Linear(16, 32))  # wrong structure

    converter = ModelConverter(source_model=source, target_model=target, verbose=False)
    ids = torch.tensor([[1, 2, 3]])
    assert converter.map_state_dicts(source_args=(ids,), target_args=(jnp.ones((1, 3, 16)),)) is None
    assert not converter


def test_model_converter_conv_net() -> None:
    torch.manual_seed(2)

    class ConvSource(nn.Module):
        def __init__(self) -> None:
            super().__init__()
            self.conv1 = nn.Conv2d(3, 8, 3, padding=1)
            self.gn = nn.GroupNorm(2, 8)
            self.conv2 = nn.Conv2d(8, 4, 1)

        def forward(self, x: torch.Tensor) -> torch.Tensor:
            return self.conv2(torch.nn.functional.silu(self.gn(self.conv1(x))))

    source = ConvSource().eval()
    target = fl.Chain(
        fl.Conv2d(3, 8, 3, padding=1),
        fl.GroupNorm(8, 2),
        fl.SiLU(),
        fl.Conv2d(8, 4, 1),
    )

    x = torch.randn(1, 3, 8, 8)
    converter = ModelConverter(source_model=source, target_model=target, verbose=False)
    assert converter.run(source_args=(x,), target_args=(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),))
