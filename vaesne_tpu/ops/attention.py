"""Fused masked multi-head attention as a Pallas TPU kernel.

The hot op of every VAESNe tower is cross/self attention over short padded
grids (bottleneck 8-16 queries x 983-token spectra context; 982x982 decoder
self-attention; 60-point light curves) with a key-padding mask
(util_layers.py:289-302 in the reference, via nn.MultiheadAttention).

The XLA lowering materializes the [B, H, Lq, Lk] logits and probability
tensors in HBM for the larger grids — at the flagship bench config
(K*B=1024, H=4, Lq=Lk=982) that is a 7.7 GB bf16 temp, an HBM OOM on one
v5e chip. This kernel keeps the whole softmax(QK^T*scale + maskbias)V
pipeline for one (batch, head, query-tile) block resident in VMEM:
HBM traffic = Q + K + V + O only, and peak memory is independent of Lq*Lk.

Layout: inputs are pre-projected per-head tensors
  q [B, H, Lq, Dh], k [B, H, Lk, Dh], v [B, H, Lk, Dh], bias [B, Lk]
(bias = 0 or -1e9, already converted from the boolean key-padding mask).
Grid = (B, H, cdiv(Lq, Q_TILE)); the query axis is tiled so backward-pass
temps (s, p, dp, ds: 4 x Q_TILE x Lk fp32) stay far under the 16 MB VMEM
budget even at Lq = Lk = 982.

Attention-weight dropout (torch nn.MultiheadAttention semantics: dropout on
the post-softmax probabilities, train mode only) runs *inside* the kernel via
the per-core PRNG (pltpu.prng_seed / prng_random_bits), so the [Lq, Lk]
dropout mask never exists in HBM either. The backward kernel reseeds with the
same per-block seed and regenerates bit-identical masks (flash-attention
style rematerialization): no residual tensor of size Lq*Lk in either
direction.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

Q_TILE = 256


def _q_tile(lq: int) -> int:
    """Adaptive query tile: full (8-aligned) length for short grids — the
    bottleneck towers have 8-16 queries and must not pad to 256 rows — and
    Q_TILE rows for the long 982-token decoder grids."""
    return min(Q_TILE, max(8, -(-lq // 8) * 8))


def _dropout_mask(seed_ref, shape, rate):
    """Regenerate the per-block dropout keep-mask from the block-indexed seed.

    Identical in forward and backward (same seed arithmetic, same shape) so
    the masks match bit-for-bit without storing them.
    """
    b, h, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    block = (b * pl.num_programs(1) + h) * pl.num_programs(2) + t
    pltpu.prng_seed(seed_ref[0] + block)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(rate, 1.0) * 4294967295.0)
    return bits >= threshold


def _row_validity(lq, qt):
    """Boolean [qt, 1]: which rows of this query tile are in range.

    Edge tiles (Lq % qt != 0) contain padding rows whose contents are
    undefined; they are discarded on output write automatically but MUST be
    masked out of the dk/dv accumulations in the backward kernel.
    """
    t = pl.program_id(2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (qt, 1), 0)
    return rows + t * qt < lq


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, rate, lq, qt):
    q = q_ref[0, 0]  # [qt, Dh]
    k = k_ref[0, 0]  # [Lk, Dh]
    v = v_ref[0, 0]
    bias = bias_ref[0, 0]  # [Lk]
    dh = q.shape[-1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(dh))
    s = s + bias[None, :]
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        keep = _dropout_mask(seed_ref, p.shape, rate)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - rate))
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, rate, lq, qt):
    valid = _row_validity(lq, qt)
    # Padding rows of edge tiles hold undefined data (can be NaN/inf): zero
    # them at load so 0-weighted contributions stay 0 (0*NaN == NaN).
    q = jnp.where(valid, q_ref[0, 0], 0.0)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    bias = bias_ref[0, 0]
    do = jnp.where(valid, do_ref[0, 0], 0.0)
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias[None, :]
    p = jax.nn.softmax(s, axis=-1)  # recomputed, [qt, Lk]
    if rate > 0.0:
        keep = _dropout_mask(seed_ref, p.shape, rate)
        inv = 1.0 / (1.0 - rate)
        p_drop = jnp.where(keep, p, 0.0) * inv
    else:
        p_drop = p
    # out = p_drop @ v; padding rows carry undefined q/do — zero their
    # contribution to the k/v accumulations.
    p_acc = jnp.where(valid, p_drop, 0.0)
    dp_drop = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Q_TILE, Lk]
    if rate > 0.0:
        dp = jnp.where(keep, dp_drop, 0.0) * inv
    else:
        dp = dp_drop
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    ds = jnp.where(valid, ds, 0.0)
    dq_ref[0, 0] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    dv_ref[0, 0] += jax.lax.dot_general(
        p_acc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)


def _specs(Lk, Dh, qt):
    qspec = pl.BlockSpec((1, 1, qt, Dh), lambda b, h, t: (b, h, t, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, Lk, Dh), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    # bias travels as [B, 1, Lk]: a (1, 1, Lk) block keeps the last two
    # dims equal to the array dims (TPU block-shape rule).
    bspec = pl.BlockSpec((1, 1, Lk), lambda b, h, t: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return qspec, kspec, bspec, sspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q: Array, k: Array, v: Array, bias: Array,
                    dropout_rate: float = 0.0,
                    interpret: bool = False,
                    seed: Array | None = None) -> Array:
    """softmax(q k^T / sqrt(Dh) + bias) v, fused per (batch, head, q-tile).

    q: [B, H, Lq, Dh]; k, v: [B, H, Lk, Dh]; bias: [B, Lk] additive logit
    bias (0 for visible keys, -1e9 for masked). ``dropout_rate`` > 0 applies
    attention-weight dropout inside the kernel (requires ``seed``, an int32
    scalar array; same seed -> same mask). Returns [B, H, Lq, Dh].
    """
    return _attention_fwd_impl(q, k, v, bias, dropout_rate, interpret, seed)


def _seed_arr(seed):
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(seed, jnp.int32).reshape((1,))


def _attention_fwd_impl(q, k, v, bias, rate, interpret, seed):
    if rate > 0.0 and seed is None:
        raise ValueError("fused_attention: dropout_rate > 0 requires a seed")
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    qt = _q_tile(Lq)
    n_tiles = pl.cdiv(Lq, qt)
    qspec, kspec, bspec, sspec = _specs(Lk, Dh, qt)
    kernel = functools.partial(_fwd_kernel, rate=rate, lq=Lq, qt=qt)
    return pl.pallas_call(
        kernel,
        grid=(B, H, n_tiles),
        in_specs=[sspec, qspec, kspec, kspec, bspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(_seed_arr(seed), q, k, v, bias[:, None, :])


def _attention_fwd(q, k, v, bias, rate, interpret, seed):
    # NB: with nondiff_argnums, jax calls fwd with the PRIMAL signature
    # (nondiff args in their original positions); only bwd gets them first.
    out = _attention_fwd_impl(q, k, v, bias, rate, interpret, seed)
    return out, (q, k, v, bias, seed)


def _attention_bwd(rate, interpret, res, do):
    q, k, v, bias, seed = res
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    qt = _q_tile(Lq)
    n_tiles = pl.cdiv(Lq, qt)
    qspec, kspec, bspec, sspec = _specs(Lk, Dh, qt)
    kernel = functools.partial(_bwd_kernel, rate=rate, lq=Lq, qt=qt)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, H, n_tiles),
        in_specs=[sspec, qspec, kspec, kspec, bspec, qspec],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
    )(_seed_arr(seed), q, k, v, bias[:, None, :], do)
    return dq, dk, dv, jnp.zeros_like(bias), None


# custom_vjp with nondiff_argnums: the nondiff args are passed first to fwd/bwd
fused_attention.defvjp(_attention_fwd, _attention_bwd)


def attention_reference(q, k, v, bias):
    """Pure-XLA reference implementation (same math, unfused, no dropout)."""
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
