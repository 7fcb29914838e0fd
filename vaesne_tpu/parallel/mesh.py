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


def resolve_mesh(spec: str = "auto", batch_size: Optional[int] = None) -> Optional[Mesh]:
    """Turn a config-level mesh spec into a Mesh (or None = single device).

    The production drivers pass ``train_cfg.mesh`` here so every CLI trains
    and evaluates data-parallel on multi-chip hosts by default (SURVEY §2.4:
    batch-sharded DP over ICI is *the* parallelism replacing the reference's
    single-device story, test_photospectra.py:8):

      * ``"auto"`` — all visible devices on the data axis; None when only
        one device exists (the single-chip fast path, no placement
        overhead). With ``batch_size``, the data axis is
        ``gcd(batch_size, device_count)`` so a batch that cannot shard
        evenly degrades to fewer chips instead of erroring — explicit
        specs below stay strict.
      * ``"none"`` / ``"off"`` / ``"1"`` — force single-device
      * ``"4"``    — 4-device data-parallel mesh (first 4 devices)
      * ``"4x2"``  — (data=4, model=2): DP × Megatron TP; pair with
        ``shard_state_tp`` and an unflattened optimizer
    """
    s = str(spec).strip().lower()
    if s in ("none", "off", "1", ""):
        return None
    if s == "auto":
        n = jax.device_count()
        if batch_size is not None:
            import math

            n = math.gcd(int(batch_size), n)
            if n < jax.device_count():
                import warnings

                warnings.warn(
                    f"mesh='auto': batch size {batch_size} does not divide "
                    f"the {jax.device_count()} visible devices; training on "
                    f"{max(n, 1)} chip(s). Pick a batch divisible by the "
                    "device count (or an explicit mesh spec) to use them "
                    "all.", RuntimeWarning, stacklevel=2)
        if n <= 1:
            return None
        return make_mesh(devices=jax.devices()[:n], data=n)
    if "x" in s:
        data, model = (int(v) for v in s.split("x", 1))
    else:
        data, model = int(s), 1
    n = data * model
    avail = jax.devices()
    if n > len(avail):
        raise ValueError(
            f"mesh spec {spec!r} needs {n} devices, only {len(avail)} "
            "visible")
    return make_mesh(devices=avail[:n], data=data, model=model)


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
