"""Device-mesh and sharding utilities (SPMD over ICI).

The reference has no in-process parallelism at all — its only scale-out is a
400-job SLURM array for eval sharding (SURVEY §2.4; spect_cond_LC.sh
``--array=0-399``). The TPU-native replacement: a ``jax.sharding.Mesh`` over
the slice's ICI, batch-axis sharding for train and eval steps, parameters
replicated, and XLA GSPMD inserting the gradient ``psum``s. At VAESNe's model
sizes (~10⁵–10⁶ params) data parallelism is the only profitable axis; a
``model`` mesh axis is still plumbed through so larger configs can shard
weights without API changes.

Multi-chip hardware is exercised in CI via
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` (see tests/conftest.py)
and by the driver's ``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh; defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a batch pytree with its leading axis sharded over ``data``.

    Leaf batch sizes must divide the data-axis size (fixed-shape batches make
    this a static check, caught at placement not mid-step).
    """
    sharding = batch_sharding(mesh)

    def place(a):
        if a.shape[0] % mesh.shape[DATA_AXIS] != 0:
            raise ValueError(
                f"batch dim {a.shape[0]} not divisible by data axis "
                f"{mesh.shape[DATA_AXIS]}"
            )
        return jax.device_put(a, sharding)

    return jax.tree_util.tree_map(place, batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a TrainState (params/opt state/rng) across the mesh."""
    return jax.device_put(state, replicated(mesh))


def shard_data_parallel(data: Any, state: Any, mesh: Mesh):
    """Convenience: (sharded data, replicated state) for DP training."""
    return shard_batch(data, mesh), replicate_state(state, mesh)
