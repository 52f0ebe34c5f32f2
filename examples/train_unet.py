"""Finetune the SD1.5 UNet on the latent-diffusion objective.

    python examples/train_unet.py --weights-dir ~/weights

The UNet is a registered model: the Trainer's backward pass is
`jax.value_and_grad` over `compute_loss` with the registered modules as the
differentiable inputs, jitted as one program (forward + backward). Swap the
data iterable for a real latents/caption dataset to train for real.
"""

from __future__ import annotations

import argparse
from pathlib import Path


CONFIG = """
[training]
duration = "100:step"
gradient_accumulation = "4:step"
dtype = "float32"

[optimizer]
optimizer = "AdamW"
learning_rate = 1e-5

[lr_scheduler]
type = "ConstantLR"
warmup = "10:step"

[unet]
requires_grad = true
"""


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--weights-dir", type=Path, required=True)
    p.add_argument("--config", type=Path, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from refiners_tpu.foundationals.latent_diffusion import DDPM, SD1UNet
    from refiners_tpu.training_utils import BaseConfig, ModelConfig, Trainer, register_model

    class Config(BaseConfig):
        unet: ModelConfig = ModelConfig()

    if args.config is None:
        cfg_path = Path("/tmp/train_unet.toml")
        cfg_path.write_text(CONFIG)
    else:
        cfg_path = args.config

    weights_dir = args.weights_dir

    class UnetTrainer(Trainer[Config, dict]):
        @register_model()
        def unet(self, config: ModelConfig) -> SD1UNet:
            unet = SD1UNet(in_channels=4)
            unet.load_from_safetensors(weights_dir / "sd15.unet.safetensors")
            return unet

        def create_data_iterable(self):
            rs = np.random.RandomState(0)
            return [
                {
                    "latents": rs.randn(1, 32, 32, 4).astype(np.float32),
                    "text": rs.randn(1, 77, 768).astype(np.float32),
                }
                for _ in range(100)
            ]

        def compute_loss(self, batch) -> jax.Array:
            solver = DDPM(num_inference_steps=1000)
            latents = jnp.asarray(batch["latents"])
            key = jax.random.key(self.clock.step)
            noise = jax.random.normal(key, latents.shape, latents.dtype)
            step = 500  # fixed here; sample per step in real training
            noised = solver.add_noise(latents, noise, step)
            self.unet.set_timestep(solver.timesteps[step][None])
            self.unet.set_clip_text_embedding(jnp.asarray(batch["text"]))
            prediction = self.unet(noised)
            return jnp.mean((prediction - noise) ** 2)

    trainer = UnetTrainer(Config.load_from_toml(cfg_path))
    trainer.train()


if __name__ == "__main__":
    main()
