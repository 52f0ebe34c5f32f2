"""Swin / MVANet parity vs the reference (random weights, CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


def _fill_relative_position_indices(ref_model: "torch.nn.Module") -> None:
    """The reference leaves `relative_position_index` empty (it normally comes
    from the checkpoint); fill it with the standard swin index table."""
    from refiners.foundationals.swin.swin_transformer import RelativePositionBias as RefRPB

    from refiners_tpu.foundationals.swin.swin_transformer import _relative_position_index

    for module in ref_model.modules():
        if isinstance(module, RefRPB):
            n = module.relative_position_index.shape[0]
            ws = int(round(n**0.5))
            module.relative_position_index.copy_(torch.from_numpy(_relative_position_index(ws)))
            # the table is torch.empty-initialized (garbage without a checkpoint)
            module.relative_position_bias_table.data.normal_(0, 0.02)


def test_swin_transformer_matches_reference() -> None:
    torch.manual_seed(0)
    from refiners.foundationals.swin.swin_transformer import SwinTransformer as RefSwin

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.swin import SwinTransformer

    ref = RefSwin().eval()
    _fill_relative_position_indices(ref)
    ours = SwinTransformer()
    load_reference_state_dict(ours, {k: v.detach().numpy() for k, v in ref.state_dict().items()})

    x = torch.randn(1, 3, 448, 448)
    with torch.no_grad():
        ref_outputs = ref(x)  # tuple of 5 NCHW maps, fine→coarse? (inserted at 0)
    our_outputs = ours(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))

    assert len(ref_outputs) == len(our_outputs) == 5
    for ref_o, our_o in zip(ref_outputs, our_outputs):
        got = np.asarray(our_o).transpose(0, 3, 1, 2)  # ours NHWC → NCHW
        np.testing.assert_allclose(got, ref_o.numpy(), atol=1e-4)


@pytest.mark.slow
def test_mvanet_matches_reference() -> None:
    torch.manual_seed(1)
    from refiners.foundationals.swin.mvanet import MVANet as RefMVANet

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.swin.mvanet import MVANet

    # reduced depths keep the runtime tolerable on one CPU core
    depths, heads = [1, 1, 2, 1], [4, 8, 16, 32]
    ref = RefMVANet(depths=depths, num_heads=heads).eval()
    _fill_relative_position_indices(ref)
    ours = MVANet(depths=depths, num_heads=heads)
    load_reference_state_dict(ours, {k: v.detach().numpy() for k, v in ref.state_dict().items()})

    x = torch.randn(1, 3, 1024, 1024)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = np.asarray(ours(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    # f32 accumulation noise through the deep decoder: ≤1e-2 max-pixel (north star)
    np.testing.assert_allclose(got, expected, atol=1e-2)
