"""Text-to-image with SD1.5 or SDXL.

    python examples/txt2img.py --model sdxl --prompt "a lighthouse at dawn" \
        --weights-dir ~/weights --steps 30 --size 1024

Weights are refiners-layout safetensors (see docs/conversion.md for
converting diffusers / civitai checkpoints).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["sd15", "sdxl"], default="sd15")
    p.add_argument("--prompt", required=True)
    p.add_argument("--negative", default="low quality, blurry")
    p.add_argument("--weights-dir", type=Path, required=True)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--scale", type=float, default=None)
    p.add_argument("--out", type=Path, default=Path("output.png"))
    args = p.parse_args()

    import jax.numpy as jnp

    from refiners_tpu.pipelines import TextToImage

    if args.model == "sdxl":
        from refiners_tpu.foundationals.latent_diffusion import DDIM
        from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl import StableDiffusion_XL

        sd = StableDiffusion_XL(solver=DDIM(num_inference_steps=args.steps), dtype=jnp.bfloat16)
        names = {"unet": "sdxl.unet", "lda": "sdxl.autoencoder", "clip_text_encoder": "sdxl.text_encoder"}
        size = args.size or 1024
    else:
        from refiners_tpu.foundationals.latent_diffusion import DDIM, StableDiffusion_1

        sd = StableDiffusion_1(solver=DDIM(num_inference_steps=args.steps), dtype=jnp.bfloat16)
        names = {"unet": "sd15.unet", "lda": "sd15.autoencoder", "clip_text_encoder": "sd15.text_encoder"}
        size = args.size or 512

    for attr, stem in names.items():
        getattr(sd, attr).load_from_safetensors(args.weights_dir / f"{stem}.safetensors")

    pipe = TextToImage(sd, size=(size, size), condition_scale=args.scale)
    image = pipe(args.prompt, negative_prompt=args.negative, seed=args.seed)
    image.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
