"""Fused masked multi-head attention as a Pallas TPU kernel.

The hot op of every VAESNe tower is cross/self attention over short padded
grids (bottleneck 8–16 queries × 983-token spectra context; 982×982 decoder
self-attention; 60-point light curves) with a key-padding mask
(util_layers.py:289-302 in the reference, via nn.MultiheadAttention).

The XLA lowering materializes the [B, H, Lq, Lk] logits and probability
tensors in HBM between ops for the larger grids; this kernel keeps the whole
softmax(QKᵀ·scale + maskbias)V pipeline for one (batch, head) block resident
in VMEM:  HBM traffic = Q + K + V + O only.

Layout: inputs are pre-projected per-head tensors
  q [B, H, Lq, Dh], k [B, H, Lk, Dh], v [B, H, Lk, Dh], bias [B, Lk]
(bias = 0 or −1e9, already converted from the boolean mask). Grid = (B, H).
Head dims here are small (8–16 lanes), so blocks are padded to the 128-lane
tile internally by Mosaic; the win is fusion, not MXU utilization — validated
by `bench.py` before the dispatch flag defaults on.

A custom VJP recomputes the probabilities in the backward kernel
(flash-attention style rematerialization) so no [Lq, Lk] tensor ever hits HBM
in either direction.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    q = q_ref[0, 0]  # [Lq, Dh]
    k = k_ref[0, 0]  # [Lk, Dh]
    v = v_ref[0, 0]
    bias = bias_ref[0]  # [Lk]
    dh = q.shape[-1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(dh))
    s = s + bias[None, :]
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    bias = bias_ref[0]
    do = do_ref[0, 0]
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias[None, :]
    p = jax.nn.softmax(s, axis=-1)  # recompute, [Lq, Lk]
    dv_ref[0, 0] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Lq, Lk]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq_ref[0, 0] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _specs(Lq, Lk, Dh):
    qspec = pl.BlockSpec((1, 1, Lq, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, Lk, Dh), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, Lk), lambda b, h: (b, 0), memory_space=pltpu.VMEM)
    return qspec, kspec, bspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(q: Array, k: Array, v: Array, bias: Array,
                    interpret: bool = False) -> Array:
    """softmax(q kᵀ / √Dh + bias) v, fused per (batch, head) block.

    q: [B, H, Lq, Dh]; k, v: [B, H, Lk, Dh]; bias: [B, Lk] additive logit
    bias (0 for visible keys, −1e9 for masked). Returns [B, H, Lq, Dh].
    """
    return _attention_fwd_impl(q, k, v, bias, interpret)


def _attention_fwd_impl(q, k, v, bias, interpret):
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    qspec, kspec, bspec = _specs(Lq, Lk, Dh)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, H),
        in_specs=[qspec, kspec, kspec, bspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def _attention_fwd(interpret, q, k, v, bias):
    out = _attention_fwd_impl(q, k, v, bias, interpret)
    return out, (q, k, v, bias)


def _attention_bwd(interpret, res, do):
    q, k, v, bias = res
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    qspec, kspec, bspec = _specs(Lq, Lk, Dh)
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=(B, H),
        in_specs=[qspec, kspec, kspec, bspec, qspec],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
    )(q, k, v, bias, do)
    return dq, dk, dv, jnp.zeros_like(bias)


# custom_vjp with nondiff_argnums: the nondiff arg is passed first to fwd/bwd
fused_attention.defvjp(_attention_fwd, _attention_bwd)


def attention_reference(q, k, v, bias):
    """Pure-XLA reference implementation (same math, unfused)."""
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
