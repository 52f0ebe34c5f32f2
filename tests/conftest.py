"""Test configuration.

Unit/parity tests run on CPU with 8 virtual devices so multi-chip mesh tests
(`jax.sharding.Mesh`) execute without TPU hardware, mirroring the reference's
device-from-env pattern (/root/reference/tests/conftest.py:18-23).
Set REFINERS_TPU_TEST_DEVICE=tpu to run on a real chip.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# persistent XLA compilation cache: full-topology UNet graphs take minutes to
# compile on the 1-core CPU test box; repeated suite runs hit the cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/refiners_tpu_xla_cache")

import jax

_test_device = os.environ.get("REFINERS_TPU_TEST_DEVICE", "cpu")
if _test_device == "cpu":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def test_device() -> str:
    return _test_device


@pytest.fixture(autouse=True)
def _seed_rng() -> None:
    from refiners_tpu.fluxion import manual_seed

    manual_seed(0)
