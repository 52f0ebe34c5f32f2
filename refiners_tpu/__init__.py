"""refiners-tpu: a TPU-native JAX framework with the capabilities of Refiners.

Layers/models are declarative pytree module trees (`refiners_tpu.fluxion`);
adapters perform pre-jit graph surgery that compiles into a single XLA graph;
hot ops lower to Pallas kernels (`refiners_tpu.ops`); multi-chip scaling goes
through `jax.sharding.Mesh` (`refiners_tpu.parallel`).
"""

__version__ = "0.1.0"
