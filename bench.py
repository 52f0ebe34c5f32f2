"""Benchmark: SD1.5 512x512 text-to-image, 30 denoise steps + VAE decode,
bf16, CFG 7.5, single chip. Prints ONE JSON line.

The 30-step loop is one jitted lax.scan program; decode is a second jit.
Baseline (BASELINE.json north star): SDXL 1024^2 >= 1 img/s per v5e-8 chip —
until SDXL lands in bench, we report SD1.5 512^2 img/s on one chip against a
1.0 img/s reference point.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    import refiners_tpu.fluxion.layers as fl
    from refiners_tpu.fluxion import manual_seed
    from refiners_tpu.foundationals.latent_diffusion import DDIM, SD1Autoencoder, SD1UNet, StableDiffusion_1

    manual_seed(0)
    dtype = jnp.bfloat16
    sd = StableDiffusion_1(
        unet=SD1UNet(in_channels=4, dtype=dtype),
        lda=SD1Autoencoder(dtype=dtype),
        # the benchmark feeds a precomputed embedding; skip building CLIP
        clip_text_encoder=fl.Chain(fl.Identity()),  # type: ignore[arg-type]
        solver=DDIM(num_inference_steps=30),
    )

    emb = jnp.zeros((2, 77, 768), dtype)
    x0 = jax.random.normal(jax.random.key(0), (1, 64, 64, 4), dtype)

    diffuse = jax.jit(lambda m, x, e: m.diffuse(x, clip_text_embedding=e))
    decode = jax.jit(lambda lda, z: lda.decode(z))

    # warmup / compile
    z = diffuse(sd, x0, emb)
    img = decode(sd.lda, z)
    img.block_until_ready()

    # chain each run on the previous output so every iteration is real work
    runs = 3
    x = x0
    t0 = time.perf_counter()
    for _ in range(runs):
        z = diffuse(sd, x, emb)
        img = decode(sd.lda, z)
        x = z / 14.6  # renormalize to init-noise scale; keeps the chain honest
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / runs

    value = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "SD1.5 512x512 30-step txt2img (bf16, CFG, single chip)",
                "value": round(value, 4),
                "unit": "img/s",
                "vs_baseline": round(value / 1.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
