"""SD1.5 with a ControlNet and a LoRA stacked, sharded data-parallel.

    python examples/controlnet_lora.py --weights-dir ~/weights \
        --condition canny.png --lora pixel_art.safetensors --prompt "..."

Shows the composition story: adapters are chain surgery before jit, so the
ControlNet + LoRA + CFG denoise loop compiles into one XLA program, and the
CFG batch pair shards over the mesh's data axis.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--weights-dir", type=Path, required=True)
    p.add_argument("--condition", type=Path, required=True)
    p.add_argument("--lora", type=Path, default=None)
    p.add_argument("--prompt", required=True)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", type=Path, default=Path("output.png"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from refiners_tpu.fluxion.utils import image_to_tensor, load_from_safetensors
    from refiners_tpu.foundationals.latent_diffusion import DDIM, SDLoraManager, StableDiffusion_1
    from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1 import SD1ControlnetAdapter
    from refiners_tpu.parallel import data_sharding, make_mesh

    sd = StableDiffusion_1(solver=DDIM(num_inference_steps=args.steps), dtype=jnp.bfloat16)
    sd.unet.load_from_safetensors(args.weights_dir / "sd15.unet.safetensors")
    sd.lda.load_from_safetensors(args.weights_dir / "sd15.autoencoder.safetensors")
    sd.clip_text_encoder.load_from_safetensors(args.weights_dir / "sd15.text_encoder.safetensors")

    controlnet = SD1ControlnetAdapter(
        sd.unet,
        name="canny",
        scale=0.8,
        weights=load_from_safetensors(args.weights_dir / "controlnet.sd15.canny.safetensors"),
    ).inject()

    if args.lora is not None:
        SDLoraManager(sd).add_loras("style", tensors=load_from_safetensors(args.lora), scale=0.7)

    condition = image_to_tensor(Image.open(args.condition).convert("RGB"))
    controlnet.set_controlnet_condition(jnp.concatenate([condition, condition]))

    emb = sd.compute_clip_text_embedding(text=args.prompt, negative_text="low quality")
    key = jax.random.key(args.seed)
    h = w = 512
    x = jax.random.normal(key, (1, h // 8, w // 8, 4), dtype=jnp.float32).astype(jnp.bfloat16)

    # data-parallel over the mesh: the CFG pair splits across devices inside diffuse
    mesh = make_mesh()
    x = jax.device_put(x, data_sharding(mesh, x.ndim))

    diffuse = jax.jit(lambda m, x, e, k: m.diffuse(x, clip_text_embedding=e, condition_scale=7.5, key=k))
    latents = diffuse(sd, x, emb, key)

    sd.lda.latents_to_image(latents).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
