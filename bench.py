"""Benchmark: SDXL 1024x1024 text-to-image, 30 denoise steps + VAE decode,
bf16, CFG 5.0, single chip — the BASELINE.json north-star configuration.
Prints ONE JSON line.

The 30-step loop is one jitted lax.scan program (zero host round-trips
between steps); runs are chained on data so every iteration is real work.
North star: >= 1 img/s per v5e-8; vs_baseline is img/s against that 1.0.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.latent_diffusion import DDIM, SDXLAutoencoder, SDXLUNet, StableDiffusion_XL

    manual_seed(0)
    dtype = jnp.bfloat16
    sd = StableDiffusion_XL(
        unet=SDXLUNet(in_channels=4, dtype=dtype),
        lda=SDXLAutoencoder(dtype=dtype),
        # the benchmark feeds precomputed embeddings; skip building CLIP
        clip_text_encoder=fl.Chain(fl.Identity()),  # type: ignore[arg-type]
        solver=DDIM(num_inference_steps=30),
    )

    emb = jnp.zeros((2, 77, 2048), dtype)
    pooled = jnp.zeros((2, 1280), dtype)
    time_ids = sd.default_time_ids
    x0 = jax.random.normal(jax.random.key(0), (1, 128, 128, 4), dtype)

    diffuse = jax.jit(
        lambda m, x, e, p, t: m.diffuse(
            x, clip_text_embedding=e, pooled_text_embedding=p, time_ids=t, condition_scale=5.0
        )
    )
    decode = jax.jit(lambda lda, z: lda.decode(z))

    # warmup / compile (host-fetch: block_until_ready alone can return at
    # enqueue time on remote-tunnel backends, so force a device→host readback)
    z = diffuse(sd, x0, emb, pooled, time_ids)
    img = decode(sd.lda, z)
    float(jnp.sum(img.astype(jnp.float32)))

    # chain each run on the previous outputs (incl. the decoded image) so no
    # iteration's work can be skipped or overlapped away
    runs = 3
    x = x0
    t0 = time.perf_counter()
    for _ in range(runs):
        z = diffuse(sd, x, emb, pooled, time_ids)
        img = decode(sd.lda, z)
        x = z / 14.6 + (jnp.mean(img) * 0).astype(dtype)  # renormalize + decode dependency
    total = float(jnp.sum(x.astype(jnp.float32))) + float(jnp.sum(img.astype(jnp.float32)))
    assert total == total, "non-finite benchmark output"
    dt = (time.perf_counter() - t0) / runs

    value = 1.0 / dt
    # north star (BASELINE.json): >= 1 img/s per v5e-8, i.e. 0.125 img/s/chip
    print(
        json.dumps(
            {
                "metric": "SDXL 1024x1024 30-step txt2img (bf16, CFG, single v5e chip)",
                "value": round(value, 4),
                "unit": "img/s",
                "vs_baseline": round(value / 0.125, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
