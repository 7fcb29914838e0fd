"""Fused masked Laplace log-likelihood reduction (Pallas TPU kernel).

The likelihood term of every VAESNe objective is
  Σ_grid log Laplace(x | loc, scale)  with  scale = 1 + BIG·mask
(reference: losses.py:20 + the decoder mask-variance trick at
PhotometricVAE.py:91-94 / SpectraVAE.py:84-86). Over [K·B, 982] grids this is
elementwise |x−loc|, log, and a reduction; the kernel fuses mask→scale
construction, log-pdf, and the grid-axis sum in VMEM so the [K·B, N] scale
and log-prob tensors never exist in HBM.

Backward recomputes sign(x−loc)/scale in a second elementwise kernel
(custom VJP), differentiating w.r.t. ``loc`` only — x and mask are data.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

ROW_TILE = 8


def _fwd_kernel(loc_ref, x_ref, mask_ref, big_ref, out_ref):
    loc = loc_ref[...]
    x = x_ref[...]
    scale = 1.0 + big_ref[0] * mask_ref[...].astype(jnp.float32)
    lp = -jnp.abs(x - loc) / scale - jnp.log(2.0 * scale)
    out_ref[...] = jnp.sum(lp, axis=-1, keepdims=True)


def _bwd_kernel(loc_ref, x_ref, mask_ref, big_ref, g_ref, dloc_ref):
    loc = loc_ref[...]
    x = x_ref[...]
    scale = 1.0 + big_ref[0] * mask_ref[...].astype(jnp.float32)
    dloc_ref[...] = g_ref[...] * jnp.sign(x - loc) / scale


def _row_specs(N):
    rows = pl.BlockSpec((ROW_TILE, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    big = pl.BlockSpec(memory_space=pltpu.SMEM)
    return rows, out, big


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def masked_laplace_loglik(loc: Array, x: Array, mask: Array, big: float,
                          interpret: bool = False) -> Array:
    """Row sums of Laplace log-pdf with scale = 1 + big·mask.

    loc, x: [R, N] float32; mask: [R, N] bool. Returns [R].
    """
    return _fwd_impl(loc, x, mask, big, interpret)


def _fwd_pallas(loc, x, mask, bigarr, interpret):
    R, N = loc.shape
    rows, out, bigspec = _row_specs(N)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(pl.cdiv(R, ROW_TILE),),
        in_specs=[rows, rows, rows, bigspec],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        interpret=interpret,
    )(loc, x, mask, bigarr)


def _bwd_pallas(loc, x, mask, bigarr, g2, interpret):
    R, N = loc.shape
    rows, _, bigspec = _row_specs(N)
    gspec = pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(pl.cdiv(R, ROW_TILE),),
        in_specs=[rows, rows, rows, bigspec, gspec],
        out_specs=rows,
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        interpret=interpret,
    )(loc, x, mask, bigarr, g2)


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(interpret):
    """Row-partitioned forward: each row reduces independently, so a batch
    (row) sharded dp mesh runs its local rows with no collectives (same
    mechanism as ops/attention.py; rationale in ops/partition.py)."""
    from jax.experimental.custom_partitioning import custom_partitioning

    from .partition import batch_only, replicated

    @custom_partitioning
    def fwd(loc, x, mask, bigarr):
        return _fwd_pallas(loc, x, mask, bigarr, interpret)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return batch_only(mesh, arg_shapes[0].sharding, 2)

    def partition(mesh, arg_shapes, result_shape):
        b = batch_only(mesh, arg_shapes[0].sharding, 2)
        return (mesh,
                lambda loc, x, mask, bigarr: _fwd_pallas(
                    loc, x, mask, bigarr, interpret),
                b, (b, b, b, replicated(mesh)))

    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule="r n, r n, r n, s -> r o",
        need_replication_factors=("n", "s", "o"),
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(interpret):
    from jax.experimental.custom_partitioning import custom_partitioning

    from .partition import batch_only, replicated

    @custom_partitioning
    def bwd(loc, x, mask, bigarr, g2):
        return _bwd_pallas(loc, x, mask, bigarr, g2, interpret)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        return batch_only(mesh, arg_shapes[0].sharding, 2)

    def partition(mesh, arg_shapes, result_shape):
        b = batch_only(mesh, arg_shapes[0].sharding, 2)
        return (mesh,
                lambda loc, x, mask, bigarr, g2: _bwd_pallas(
                    loc, x, mask, bigarr, g2, interpret),
                b, (b, b, b, replicated(mesh), b))

    bwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule="r n, r n, r n, s, r o -> r n",
        need_replication_factors=("n", "s", "o"),
    )
    return bwd


def _fwd_impl(loc, x, mask, big, interpret):
    from .partition import shard_kernels

    bigarr = jnp.asarray([big], jnp.float32)
    if shard_kernels():
        res = _fwd_partitioned(bool(interpret))(loc, x, mask, bigarr)
    else:
        res = _fwd_pallas(loc, x, mask, bigarr, interpret)
    return res[:, 0]


def _vjp_fwd(loc, x, mask, big, interpret):
    # NB: with nondiff_argnums, jax calls fwd with the PRIMAL signature
    # (nondiff args in their original positions); only bwd gets them first.
    return _fwd_impl(loc, x, mask, big, interpret), (loc, x, mask)


def _vjp_bwd(big, interpret, res, g):
    loc, x, mask = res
    from .partition import shard_kernels

    bigarr = jnp.asarray([big], jnp.float32)
    if shard_kernels():
        dloc = _bwd_partitioned(bool(interpret))(loc, x, mask, bigarr,
                                                 g[:, None])
    else:
        dloc = _bwd_pallas(loc, x, mask, bigarr, g[:, None], interpret)
    return dloc, None, None


masked_laplace_loglik.defvjp(_vjp_fwd, _vjp_bwd)


def masked_laplace_loglik_reference(loc, x, mask, big):
    """Unfused XLA reference (identical math)."""
    scale = 1.0 + big * mask.astype(jnp.float32)
    lp = -jnp.abs(x - loc) / scale - jnp.log(2.0 * scale)
    return lp.sum(-1)
