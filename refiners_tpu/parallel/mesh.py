"""Device mesh construction.

The reference has no distributed runtime (SURVEY §2.12); scaling here is
TPU-native by design: a `jax.sharding.Mesh` over ICI with named axes
("data", "tensor"), GSPMD inferring collectives from sharding annotations —
no hand-written communication layer.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data: int | None = None, tensor: int = 1, devices: list[jax.Device] | None = None) -> Mesh:
    """Build a ("data", "tensor") mesh.

    `data=None` uses all remaining devices on the data axis. On a v5e-8 the
    natural layouts are (8, 1) for pure DP and (4, 2)/(2, 4) for DP×TP —
    both axes ride ICI.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % tensor == 0, f"{n} devices not divisible by tensor={tensor}"
        data = n // tensor
    assert data * tensor == n, f"mesh {data}x{tensor} != {n} devices"
    arr = np.asarray(devices).reshape(data, tensor)
    return Mesh(arr, axis_names=("data", "tensor"))
