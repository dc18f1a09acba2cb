"""Device mesh construction. Axes: ("data", "model") — DP x TP.

The reference has no distributed machinery at all (SURVEY.md §2.3); this subsystem
is TPU-first by design: a `jax.sharding.Mesh` over ICI, `shard_map`ped step
functions, XLA collectives. Multi-host extends the same mesh via
`jax.distributed.initialize` (the process-count axis folds into "data").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data_parallel: int = 1, tensor_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data_parallel * tensor_parallel
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data_parallel, tensor_parallel)
    return Mesh(grid, axis_names=(DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
