"""High-level compiled pipelines.

Convenience wrappers that bundle prompt encoding, the scanned denoising loop
and VAE decode into cached jit programs. Pass a `jax.sharding.Mesh` to run
data-parallel over the batch (one latent per "data" row, CFG pair split by
GSPMD) with optional tensor-parallel attention/FF weights — the TPU-native
scaling path the single-device reference lacks. Models and the step count
define the compilation key; prompts, seeds and guidance scales are runtime
inputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from PIL import Image

from refiners_tpu.fluxion import rng
from refiners_tpu.foundationals.latent_diffusion.model import LatentDiffusionModel
from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_xl.model import StableDiffusion_XL


@dataclass
class TextToImage:
    """Compiled text-to-image pipeline for SD1.5 / SDXL.

    Example:
        pipe = TextToImage(sd15)
        image = pipe("a cute cat", negative_prompt="low quality", seed=42)

    Multi-chip: `TextToImage(sdxl, mesh=make_mesh(tensor=1), num_images=8)`
    DP-shards the 8-image batch over the mesh's "data" axis and (if
    `tensor>1`) TP-shards attention/FF weights; one jitted scan program per
    step count, collectives inserted by GSPMD over ICI.
    """

    sd: LatentDiffusionModel
    size: tuple[int, int] = (512, 512)
    condition_scale: float | None = None
    mesh: Mesh | None = None
    num_images: int = 1
    _compiled: dict[Any, Any] = field(default_factory=dict)
    _sharded: bool = field(default=False, repr=False)

    def __post_init__(self) -> None:
        if self.mesh is not None:
            n_data = self.mesh.shape["data"]
            assert self.num_images % n_data == 0 or self.num_images == 1, (
                f"num_images={self.num_images} must divide the data axis ({n_data})"
            )

    @property
    def _is_xl(self) -> bool:
        return isinstance(self.sd, StableDiffusion_XL)

    def _ensure_sharded(self) -> None:
        if self.mesh is None or self._sharded:
            return
        from refiners_tpu.parallel import shard_latent_diffusion

        shard_latent_diffusion(self.sd, self.mesh)
        self._sharded = True

    def _place(self, *arrays: jax.Array) -> tuple[jax.Array, ...]:
        if self.mesh is None:
            return arrays
        from refiners_tpu.parallel import shard_inputs

        return shard_inputs(self.mesh, *arrays)

    def _diffuse_fn(self) -> Any:
        key = ("diffuse", self._is_xl)
        if key not in self._compiled:
            if self._is_xl:
                self._compiled[key] = jax.jit(
                    lambda m, x, e, p, t, s, k: m.diffuse(
                        x,
                        clip_text_embedding=e,
                        pooled_text_embedding=p,
                        time_ids=t,
                        condition_scale=s,
                        key=k,
                    ),
                    static_argnums=(5,),
                )
            else:
                self._compiled[key] = jax.jit(
                    lambda m, x, e, s, k: m.diffuse(x, clip_text_embedding=e, condition_scale=s, key=k),
                    static_argnums=(3,),
                )
        return self._compiled[key]

    def _decode_fn(self) -> Any:
        if "decode" not in self._compiled:
            self._compiled["decode"] = jax.jit(lambda lda, z: lda.decode(z))
        return self._compiled["decode"]

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        seed: int | None = None,
        condition_scale: float | None = None,
    ) -> Image.Image | list[Image.Image]:
        """Generate `num_images` images (returns a single Image when 1)."""
        if seed is not None:
            key = jax.random.key(seed)
        else:
            key = rng.next_key()
        noise_key, solver_key = jax.random.split(key)

        self._ensure_sharded()
        n = self.num_images
        h, w = self.size
        noise = jax.random.normal(noise_key, (n, h // 8, w // 8, 4), dtype=jnp.float32).astype(
            self.sd.unet.dtype or jnp.float32
        )
        x = self.sd.solver.scale_model_input(noise, step=-1)

        if self._is_xl:
            scale = condition_scale or self.condition_scale or 5.0
            emb, pooled = self.sd.compute_clip_text_embedding(prompt, negative_prompt)
            # (2, ...) [uncond, cond] → (2n, ...) [uncond×n, cond×n]: matches
            # predict_noise's concatenate((x, x)) CFG batch layout
            emb = jnp.repeat(emb, n, axis=0)
            pooled = jnp.repeat(pooled, n, axis=0)
            time_ids = jnp.repeat(self.sd.default_time_ids, n, axis=0)
            x, emb, pooled, time_ids = self._place(x, emb, pooled, time_ids)
            z = self._diffuse_fn()(self.sd, x, emb, pooled, time_ids, scale, solver_key)
        else:
            scale = condition_scale or self.condition_scale or 7.5
            emb = self.sd.compute_clip_text_embedding(prompt, negative_prompt)
            emb = jnp.repeat(emb, n, axis=0)
            x, emb = self._place(x, emb)
            z = self._diffuse_fn()(self.sd, x, emb, scale, solver_key)

        image = self._decode_fn()(self.sd.lda, z)
        from refiners_tpu.fluxion.utils import tensor_to_image

        images = [tensor_to_image((image[i : i + 1] + 1) / 2) for i in range(n)]
        return images[0] if n == 1 else images
