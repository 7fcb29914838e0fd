"""Multi-chip partitioning for the Pallas kernels.

Both production kernels are embarrassingly parallel over their leading
axis — ``fused_attention`` computes per-(batch, head) attention with no
cross-batch coupling, and ``masked_laplace_loglik`` reduces each row
independently — so a data-parallel mesh can run each shard's rows locally
with ZERO collectives inside the op. ``fused_attention`` is additionally
parallel over HEADS (its packed E axis, in whole-head slices), so a
Megatron-style tensor-parallel mesh (``parallel/tp.py``: q/k/v outputs
head-sharded) also runs the kernel locally per head shard. GSPMD/Shardy
cannot see through a Pallas custom call, though: unregistered, a dp mesh
all-gathers the full global batch onto every chip before the kernel (the
round-2 gap: SURVEY.md §2.4 names batch-sharded DP the one mandated
parallelism, and ``parallel/tp.py`` documented the kernel as
unpartitionable).

The fix is ``jax.experimental.custom_partitioning`` wrapped around each
raw ``pallas_call`` (forward and backward separately — they sit inside a
``jax.custom_vjp``, so each direction is its own custom call):

* a Shardy ``sharding_rule`` (einsum-like) marks the leading axis as a
  passthrough factor and every other dim as need-replication, so the
  partitioner propagates batch sharding through the op and knows the
  rest must be gathered if sharded;
* the ``partition`` callback keeps whatever mesh axes arrive on operand
  dim 0 and lowers to the SAME pallas_call on per-shard shapes;
* legacy-GSPMD callbacks (``infer_sharding_from_operands``) are supplied
  for ``jax_use_shardy_partitioner=False`` runs.

Dropout-seed decorrelation: the attention kernel seeds its PRNG per
(local batch, head, row-block). Under batch sharding, shard-local batch
index b repeats on every chip, so the lowering folds the shard's
linearized mesh index into the seed (stride = local_B*H*1024, one past
the kernel's per-shard namespace) — different global batch elements draw
independent masks, exactly as on one chip.

``VAESNE_SHARD_KERNELS=0`` (trace-time, like ``VAESNE_PALLAS``) bypasses
the wrapping and calls the raw kernels, as an escape hatch.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def shard_kernels() -> bool:
    from .dispatch import env_flag

    return env_flag("VAESNE_SHARD_KERNELS", True)


def axes_on_dim(sharding, dim: int) -> tuple:
    """Mesh axis names on ``dim`` of ``sharding`` as a flat tuple."""
    spec = getattr(sharding, "spec", None)
    if spec is None or len(spec) <= dim or spec[dim] is None:
        return ()
    a = spec[dim]
    return tuple(a) if isinstance(a, tuple) else (a,)


def batch_axes(sharding) -> tuple:
    """Mesh axis names on dim 0 of ``sharding`` as a flat tuple."""
    return axes_on_dim(sharding, 0)


def n_shards(mesh, axes: tuple) -> int:
    """Product of the mesh sizes of ``axes``."""
    out = 1
    for a in axes:
        out *= mesh.shape[a]
    return out


def spec_entry(axes: tuple):
    """A flat axes tuple as a PartitionSpec entry (None when unsharded)."""
    if not axes:
        return None
    return axes if len(axes) > 1 else axes[0]


def batch_only(mesh, sharding, ndim: int) -> NamedSharding:
    """The operand's dim-0 sharding with every other dim replicated."""
    axes = batch_axes(sharding)
    b = axes if len(axes) > 1 else (axes[0] if axes else None)
    return NamedSharding(mesh, P(*((b,) + (None,) * (ndim - 1))))


def replicated(mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_index(mesh, axes: tuple):
    """Linearized index of this shard over the ``axes`` mesh dims (traced
    inside a partition lowering, where the mesh axes are manual)."""
    idx = jnp.int32(0)
    for name in axes:
        idx = idx * mesh.shape[name] + jax.lax.axis_index(name)
    return idx
