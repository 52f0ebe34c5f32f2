"""Basic shape/value manipulation layers.

Reference: /root/reference/src/refiners/fluxion/layers/basics.py (:8-445).
All layers are stateless pytree nodes except `Parameter`/`Buffer`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from refiners_tpu.fluxion import rng
from refiners_tpu.fluxion.layers.module import Module, WeightedModule


class Identity(Module):
    def forward(self, x: jax.Array) -> jax.Array:
        return x


class GetArg(Module):
    """Return the n-th positional argument (basics.py:31)."""

    def __init__(self, index: int) -> None:
        super().__init__()
        self.index = index

    def forward(self, *args: Any) -> Any:
        return args[self.index]


class Flatten(Module):
    """Flatten dims [start_dim, end_dim] (basics.py:59)."""

    def __init__(self, start_dim: int = 0, end_dim: int = -1) -> None:
        super().__init__()
        self.start_dim = start_dim
        self.end_dim = end_dim

    def forward(self, x: jax.Array) -> jax.Array:
        start = self.start_dim % x.ndim
        end = self.end_dim % x.ndim
        shape = x.shape[:start] + (-1,) + x.shape[end + 1 :]
        return x.reshape(shape)


class Unflatten(Module):
    """Unflatten dim into `sizes` (basics.py:93). Sizes given at call time."""

    def __init__(self, dim: int) -> None:
        super().__init__()
        self.dim = dim

    def forward(self, x: jax.Array, sizes: tuple[int, ...]) -> jax.Array:
        dim = self.dim % x.ndim
        shape = x.shape[:dim] + tuple(sizes) + x.shape[dim + 1 :]
        return x.reshape(shape)


class Reshape(Module):
    """Reshape non-batch dims to `shape` (batch dim preserved) (basics.py:122)."""

    def __init__(self, *shape: int) -> None:
        super().__init__()
        self.shape = shape

    def forward(self, x: jax.Array) -> jax.Array:
        return x.reshape((x.shape[0], *self.shape))


class Transpose(Module):
    """Swap two dims (basics.py:153)."""

    def __init__(self, dim0: int, dim1: int) -> None:
        super().__init__()
        self.dim0 = dim0
        self.dim1 = dim1

    def forward(self, x: jax.Array) -> jax.Array:
        return jnp.swapaxes(x, self.dim0, self.dim1)


class Permute(Module):
    """Permute dims (basics.py:183)."""

    def __init__(self, *dims: int) -> None:
        super().__init__()
        self.dims = dims

    def forward(self, x: jax.Array) -> jax.Array:
        return jnp.transpose(x, self.dims)


class Slicing(Module):
    """Slice along `dim` with start/end/step (basics.py:211)."""

    def __init__(self, dim: int = 0, start: int = 0, end: int | None = None, step: int = 1) -> None:
        super().__init__()
        self.dim = dim
        self.start = start
        self.end = end
        self.step = step

    def forward(self, x: jax.Array) -> jax.Array:
        idx = [slice(None)] * x.ndim
        idx[self.dim] = slice(self.start, self.end, self.step)
        return x[tuple(idx)]


class Squeeze(Module):
    def __init__(self, dim: int) -> None:
        super().__init__()
        self.dim = dim

    def forward(self, x: jax.Array) -> jax.Array:
        return jnp.squeeze(x, axis=self.dim)


class Unsqueeze(Module):
    def __init__(self, dim: int) -> None:
        super().__init__()
        self.dim = dim

    def forward(self, x: jax.Array) -> jax.Array:
        return jnp.expand_dims(x, axis=self.dim)


class Sin(Module):
    def forward(self, x: jax.Array) -> jax.Array:
        return jnp.sin(x)


class Cos(Module):
    def forward(self, x: jax.Array) -> jax.Array:
        return jnp.cos(x)


class Multiply(Module):
    """scale * x + bias (basics.py:379)."""

    def __init__(self, scale: float = 1.0, bias: float = 0.0) -> None:
        super().__init__()
        self.scale = scale
        self.bias = bias

    def forward(self, x: jax.Array) -> jax.Array:
        return self.scale * x + self.bias


class Parameter(WeightedModule):
    """A learnable tensor returned regardless of input, broadcast over batch
    (basics.py:408)."""

    def __init__(self, *dims: int, requires_grad: bool = True, device: Any = None, dtype: Any = None) -> None:
        super().__init__()
        self.dims = dims
        self.requires_grad = requires_grad
        self.weight = rng.init_normal(dims, dtype=dtype)

    def forward(self, x: jax.Array) -> jax.Array:
        return jnp.broadcast_to(self.weight, (x.shape[0], *self.dims))


class Buffer(WeightedModule):
    """A non-learnable tensor returned regardless of input (basics.py:445)."""

    def __init__(self, *dims: int, device: Any = None, dtype: Any = None) -> None:
        super().__init__()
        self.dims = dims
        self.requires_grad = False
        self.weight = jnp.zeros(dims, dtype=dtype or jnp.float32)

    def forward(self, x: jax.Array) -> jax.Array:
        return self.weight
