"""Device mesh + sharding helpers (SURVEY.md §2.8).

Mesh axes: ('data', 'model'). DP is primary — v5e-8 runs ('data'=8,
'model'=1); the model axis exists so head-channel tensor parallelism can be
turned on later without changing any call sites. Collectives ride ICI
within a slice; multi-host extends the same program over DCN after
`jax.distributed.initialize()` (SURVEY.md §5.8).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: int | None = None,
    num_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    n = num_data * num_model
    if n > len(devices):
        raise ValueError(
            f"mesh {num_data}×{num_model} needs {n} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:n]).reshape(num_data, num_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading dim sharded over 'data' — for per-step batches."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated — for params/opt state under pure DP."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch with the leading dim split over 'data'."""
    return jax.device_put(batch, batch_sharding(mesh))
