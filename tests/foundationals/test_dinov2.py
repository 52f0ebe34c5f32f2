"""DINOv2 parity vs the reference (random weights, CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


def _compare(ref_model: "torch.nn.Module", our_model, image_hw: int) -> None:
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict

    load_reference_state_dict(our_model, {k: v.detach().numpy() for k, v in ref_model.state_dict().items()})
    x = torch.randn(1, 3, image_hw, image_hw)
    with torch.no_grad():
        expected = ref_model(x).numpy()
    got = np.asarray(our_model(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_dinov2_small_matches_reference() -> None:
    torch.manual_seed(0)
    from refiners.foundationals.dinov2 import DINOv2_small as RefModel

    from refiners_tpu.foundationals.dinov2 import DINOv2_small

    _compare(RefModel().eval(), DINOv2_small(), 518)


def test_dinov2_small_reg_matches_reference() -> None:
    torch.manual_seed(1)
    from refiners.foundationals.dinov2 import DINOv2_small_reg as RefModel

    from refiners_tpu.foundationals.dinov2 import DINOv2_small_reg

    _compare(RefModel().eval(), DINOv2_small_reg(), 518)


def test_dinov2_interpolated_positional_embedding() -> None:
    """Non-native resolutions go through InterpolateEmbedding."""
    torch.manual_seed(2)
    from refiners.foundationals.dinov2 import DINOv2_small as RefModel

    from refiners_tpu.foundationals.dinov2 import DINOv2_small

    ref = RefModel().eval()
    ours = DINOv2_small()
    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict

    load_reference_state_dict(ours, {k: v.detach().numpy() for k, v in ref.state_dict().items()})
    x = torch.randn(1, 3, 252, 252)  # 18x18 patches instead of 37x37
    with torch.no_grad():
        expected = ref(x).numpy()
    got = np.asarray(ours(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expected, atol=5e-4)
