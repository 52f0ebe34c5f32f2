"""Batched multi-prompt denoise reproduces each per-image trajectory.

Analog of the reference's batch-2 e2e cases
(/root/reference/tests/e2e/test_diffusion.py:895 test_diffusion_batch2,
:1539 test_diffusion_sdxl_batch2): CFG batching stacks [uncond…, cond…]
(model.py predict_noise), so a 2-image batch with distinct prompts must
yield row-for-row the same latents as two single-image runs. Reduced-width
models, full 10-step trajectories, fast tier.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_sd15_batch2_matches_single_runs() -> None:
    from tests.e2e.golden_cfg import build_sd15_reduced

    sd = build_sd15_reduced()
    prompts = ["a cute cat, best quality", "a red sports car"]
    negatives = ["low quality, blurry", "monochrome"]
    emb_batch = sd.compute_clip_text_embedding(text=prompts, negative_text=negatives)
    assert emb_batch.shape[0] == 4  # [uncond0, uncond1, cond0, cond1]

    noise = np.random.RandomState(3).randn(2, 16, 16, 4).astype(np.float32)
    x0 = sd.solver.scale_model_input(jnp.asarray(noise), step=-1)

    run = jax.jit(lambda m, v, e: m.diffuse(v, clip_text_embedding=e, condition_scale=7.5))
    z_batch = np.asarray(run(sd, x0, emb_batch))

    for i in range(2):
        emb_i = sd.compute_clip_text_embedding(text=prompts[i], negative_text=negatives[i])
        z_i = np.asarray(run(sd, x0[i : i + 1], emb_i))
        np.testing.assert_allclose(z_batch[i : i + 1], z_i, atol=1e-4)


def test_sdxl_batch2_matches_single_runs() -> None:
    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.latent_diffusion import DDIM
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.unet import SDXLUNet

    manual_seed(1)
    unet = SDXLUNet(in_channels=4, base_channels=32)
    solver = DDIM(num_inference_steps=10)

    rs = np.random.RandomState(5)
    emb = jnp.asarray(rs.randn(4, 77, 2048).astype(np.float32))  # [u0, u1, c0, c1]
    pooled = jnp.asarray(rs.randn(4, 1280).astype(np.float32))
    time_ids = jnp.asarray(np.tile([128.0, 128.0, 0.0, 0.0, 128.0, 128.0], (4, 1)).astype(np.float32))
    noise = jnp.asarray(rs.randn(2, 16, 16, 4).astype(np.float32))

    def step(u, x, e, p, t):
        # one CFG step of the SDXL UNet over the batch (the diffuse body's
        # conditioning layout, without needing the full SDXL facade here)
        u.set_timestep(timestep=solver.timesteps[0][None])
        u.set_clip_text_embedding(clip_text_embedding=e)
        u.set_pooled_text_embedding(pooled_text_embedding=p)
        u.set_time_ids(time_ids=t)
        latents = jnp.concatenate((x, x))
        pred = u(latents)
        uncond, cond = jnp.split(pred, 2, axis=0)
        return uncond + 7.5 * (cond - uncond)

    run = jax.jit(step)
    out_batch = np.asarray(run(unet, noise, emb, pooled, time_ids))
    for i in range(2):
        sel = jnp.asarray([i, i + 2])
        out_i = np.asarray(run(unet, noise[i : i + 1], emb[sel], pooled[sel], time_ids[sel]))
        np.testing.assert_allclose(out_batch[i : i + 1], out_i, atol=1e-4)
