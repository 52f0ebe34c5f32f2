"""Mesh-integrated Trainer: DP/TP training on the virtual 8-device mesh must
match single-device training (same data, same init, same losses), and
checkpoint/resume must round-trip sharded arrays."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import refiners_tpu.fluxion.layers as fl
from refiners_tpu.training_utils import BaseConfig, ModelConfig, Trainer, register_model

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


Batch = dict  # {"inputs": Array, "targets": Array} — a pytree, so jit_step works


class NetConfig(ModelConfig):
    pass


class MeshTrainConfig(BaseConfig):
    net: NetConfig


class Net(fl.Chain):
    def __init__(self) -> None:
        super().__init__(
            fl.Linear(16, 32),
            fl.SelfAttention(embedding_dim=32, num_heads=4),
            fl.Linear(32, 16),
        )


class MeshTrainer(Trainer[MeshTrainConfig, Batch]):
    losses: list[float]

    @register_model()
    def net(self, config: NetConfig) -> Net:
        from refiners_tpu.fluxion import manual_seed

        manual_seed(0)
        return Net()

    def create_data_iterable(self):
        rs = np.random.RandomState(0)
        return [
            {
                "inputs": jnp.asarray(rs.randn(8, 7, 16).astype(np.float32)),
                "targets": jnp.asarray(rs.randn(8, 7, 16).astype(np.float32)),
            }
            for _ in range(4)
        ]

    def compute_loss(self, batch: Batch) -> jax.Array:
        out = self.net(batch["inputs"])
        return jnp.mean((out - batch["targets"]) ** 2)

    def step(self, batch: Batch) -> None:
        super().step(batch)
        if not hasattr(self, "losses"):
            self.losses = []
        assert self.loss is not None
        self.losses.append(float(self.loss))


def _config(mesh: dict | None) -> MeshTrainConfig:
    cfg: dict = {
        "training": {"device": "cpu", "duration": "4:step", "jit_step": True},
        "optimizer": {"optimizer": "SGD", "learning_rate": 0.05},
        "lr_scheduler": {},
        "net": {},
    }
    if mesh is not None:
        cfg["training"]["mesh"] = mesh
    return MeshTrainConfig(**cfg)


def test_mesh_training_matches_single_device() -> None:
    single = MeshTrainer(config=_config(None))
    single.train()

    dp_tp = MeshTrainer(config=_config({"data": 4, "tensor": 2}))
    assert dp_tp.mesh is not None and dp_tp.mesh.shape == {"data": 4, "tensor": 2}
    dp_tp.train()

    assert len(single.losses) == len(dp_tp.losses) == 4
    np.testing.assert_allclose(single.losses, dp_tp.losses, rtol=1e-5)

    # attention weights genuinely TP-sharded after the optimizer step
    qkv = dp_tp.models["net"].model.ensure_find(fl.SelfAttention).layer("Distribute")[0]
    assert "tensor" in str(qkv.weight.sharding.spec)


class UNetConfig(ModelConfig):
    pass


class UNetTrainConfig(BaseConfig):
    unet: UNetConfig


class UNetMeshTrainer(Trainer[UNetTrainConfig, Batch]):
    """Trainer-API mesh training on a REAL SD1UNet tree (reduced width,
    identical topology/paths): per-model optax + grad accumulation + DP/TP
    sharding composed — the full production combination."""

    losses: list[float]

    @register_model()
    def unet(self, config: UNetConfig):
        from refiners_tpu.fluxion import manual_seed
        from refiners_tpu.foundationals.latent_diffusion.stable_diffusion_1.unet import SD1UNet

        manual_seed(0)
        return SD1UNet(in_channels=4, base_channels=32)

    def create_data_iterable(self):
        rs = np.random.RandomState(0)
        return [
            {
                "inputs": jnp.asarray(rs.randn(4, 16, 16, 4).astype(np.float32)),
                "text": jnp.asarray(rs.randn(4, 7, 768).astype(np.float32)),
                "targets": jnp.asarray(rs.randn(4, 16, 16, 4).astype(np.float32)),
            }
            for _ in range(4)
        ]

    def compute_loss(self, batch: Batch) -> jax.Array:
        unet = self.unet
        unet.set_timestep(jnp.asarray([500]))
        unet.set_clip_text_embedding(batch["text"])
        pred = unet(batch["inputs"])
        return jnp.mean((pred - batch["targets"]) ** 2)

    def step(self, batch: Batch) -> None:
        super().step(batch)
        if not hasattr(self, "losses"):
            self.losses = []
        assert self.loss is not None
        self.losses.append(float(self.loss))


def _unet_config(mesh: dict | None) -> UNetTrainConfig:
    cfg: dict = {
        "training": {
            "device": "cpu",
            "duration": "4:step",
            "jit_step": True,
            "gradient_accumulation": "2:step",
        },
        "optimizer": {"optimizer": "AdamW", "learning_rate": 1e-4},
        "lr_scheduler": {},
        "unet": {},
    }
    if mesh is not None:
        cfg["training"]["mesh"] = mesh
    return UNetTrainConfig(**cfg)


@pytest.mark.slow
def test_mesh_training_unet_matches_single_device() -> None:
    single = UNetMeshTrainer(config=_unet_config(None))
    single.train()

    dp_tp = UNetMeshTrainer(config=_unet_config({"data": 4, "tensor": 2}))
    dp_tp.train()

    assert len(single.losses) == len(dp_tp.losses) == 4
    np.testing.assert_allclose(single.losses, dp_tp.losses, rtol=1e-4)

    # the deep tree's attention projections are genuinely TP-sharded after
    # accumulate + optimizer steps
    unet = dp_tp.models["unet"].model
    n_tp = sum(1 for _, a in unet.arrays() if "tensor" in str(getattr(a.sharding, "spec", "")))
    assert n_tp >= 48, f"expected >=48 TP-sharded params, got {n_tp}"


def test_mesh_checkpoint_roundtrip(tmp_path) -> None:
    """Sharded model + opt state survive an orbax save/restore round-trip."""
    from refiners_tpu.training_utils.checkpointing import CheckpointCallback, CheckpointConfig

    cb = CheckpointCallback(CheckpointConfig(directory=str(tmp_path / "ckpt"), interval="100:epoch"))

    trainer = MeshTrainer(config=_config({"data": 8, "tensor": 1}))
    trainer.train()
    cb.save(trainer, "final")

    fresh = MeshTrainer(config=_config({"data": 8, "tensor": 1}))
    cb.restore(fresh, "final")
    for (pa, a), (pb, b) in zip(
        trainer.models["net"].model.arrays(), fresh.models["net"].model.arrays()
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    assert fresh.clock.step == trainer.clock.step
