"""MultiDiffusion panorama parity vs the reference (random weights).

Two overlapping tiles denoise a wide latent with per-tile solvers; the
weighted tile merge must agree step by step.
"""

import gc

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.ref_compat import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference package unavailable")


@pytest.mark.slow
@pytest.mark.parametrize("solver_name", ["ddim", "dpm"])
def test_multi_diffusion_panorama_matches_reference(solver_name: str) -> None:
    """DDIM analog of the reference's test_multi_diffusion (:2283); the "dpm"
    case is test_multi_diffusion_dpm (:2315) — a MULTISTEP solver per tile,
    so each target's first-order/second-order state must thread correctly
    through the weighted tile merge."""
    torch.manual_seed(4)
    from refiners.foundationals.latent_diffusion import StableDiffusion_1 as RefSD
    from refiners.foundationals.latent_diffusion.multi_diffusion import MultiDiffusion as RefMD
    from refiners.foundationals.latent_diffusion.solvers import DDIM as RefDDIM, DPMSolver as RefDPM
    from refiners.foundationals.latent_diffusion.stable_diffusion_1.multi_diffusion import (
        SD1DiffusionTarget as RefTarget,
        SD1MultiDiffusion as RefSD1MD,
    )

    from refiners_tpu.conversion.refiners_compat import load_reference_state_dict
    from refiners_tpu.foundationals.latent_diffusion import DDIM, DPMSolver, MultiDiffusion, StableDiffusion_1
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.multi_diffusion import (
        SD1DiffusionTarget,
        SD1MultiDiffusion,
    )

    steps = 3 if solver_name == "dpm" else 2  # ≥3 exercises DPM's second-order update
    RefSolver = RefDPM if solver_name == "dpm" else RefDDIM
    OurSolver = DPMSolver if solver_name == "dpm" else DDIM
    ref_sd = RefSD(solver=RefSolver(num_inference_steps=steps))
    ref_sd.unet.eval()
    our_sd = StableDiffusion_1(solver=OurSolver(num_inference_steps=steps))
    load_reference_state_dict(our_sd.unet, {k: v.detach().numpy() for k, v in ref_sd.unet.state_dict().items()})

    from refiners.fluxion.utils import no_grad
    from refiners.foundationals.latent_diffusion.multi_diffusion import Size as RefSize

    from refiners_tpu.foundationals.latent_diffusion.multi_diffusion import Size as OurSize

    # 32x48 latent covered by two 32x32 tiles
    ref_tiles = RefMD.generate_latent_tiles(size=RefSize(32, 48), tile_size=RefSize(32, 32))

    our_tiles = MultiDiffusion.generate_latent_tiles(size=OurSize(32, 48), tile_size=OurSize(32, 32))
    assert len(ref_tiles) == len(our_tiles)

    rs = np.random.RandomState(3)
    emb = rs.randn(2, 77, 768).astype(np.float32)
    noise = rs.randn(1, 4, 32, 48).astype(np.float32)

    ref_md = RefSD1MD(ref_sd)
    ref_targets = [
        RefTarget(tile=t, solver=RefSolver(num_inference_steps=steps), clip_text_embedding=torch.from_numpy(emb.copy()))
        for t in ref_tiles
    ]
    x_ref = torch.from_numpy(noise.copy())
    with no_grad():
        for step in ref_sd.steps:
            x_ref = ref_md(x_ref, noise=torch.from_numpy(noise.copy()), step=step, targets=ref_targets)
    del ref_sd, ref_md
    gc.collect()

    our_md = SD1MultiDiffusion(our_sd)
    our_targets = [
        SD1DiffusionTarget(tile=t, solver=OurSolver(num_inference_steps=steps), clip_text_embedding=jnp.asarray(emb))
        for t in our_tiles
    ]
    x_our = jnp.asarray(noise.transpose(0, 2, 3, 1))
    noise_our = jnp.asarray(noise.transpose(0, 2, 3, 1))
    for step in our_sd.steps:
        x_our = our_md(x_our, noise=noise_our, step=step, targets=our_targets)

    np.testing.assert_allclose(np.asarray(x_our).transpose(0, 3, 1, 2), x_ref.numpy(), atol=2e-3)
