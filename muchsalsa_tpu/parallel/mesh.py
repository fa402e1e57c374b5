"""Device-mesh construction.

The reference's parallelism is a thread pool sized by a CLI arg
(``ThreadPool.cpp:38``, ``Application.cpp:79``); the TPU-native
equivalent is a ``jax.sharding.Mesh`` whose data axis streams nanopore
read batches across chips (SURVEY.md §2.5 mapping table).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "reads") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
