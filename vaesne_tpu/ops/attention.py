"""Fused masked multi-head attention as a Pallas TPU kernel.

The hot op of every VAESNe tower is cross/self attention over short padded
grids (bottleneck 8-16 queries x 983-token spectra context; 982x982 decoder
self-attention; 60-point light curves) with a key-padding mask
(util_layers.py:289-302 in the reference, via nn.MultiheadAttention).

Two TPU memory problems shape this kernel:

1. The XLA lowering materializes the [B, H, Lq, Lk] logits/probability
   tensors in HBM for the larger grids — 7.7 GB bf16 at the flagship bench
   config (K*B=1024, H=4, Lq=Lk=982). The kernel keeps the whole
   softmax(QK^T*scale + maskbias)V pipeline for one (batch, head,
   query-tile) block in VMEM: HBM traffic = Q + K + V + O only.

2. TPU HBM arrays are tiled (last dim -> 128 lanes), so a per-head
   [B, H, L, Dh=8] operand layout pads 8 -> 128: a 16x memory blowup on
   every kernel operand (observed: 122 MB of data occupying 1.92 GB). IO
   therefore uses the PACKED TRANSPOSED layout [B, E, L] (E = H*Dh = embed
   dim): the last dim is the sequence (982 -> 1024, ~4% padding) and each
   head is an E-axis slice selected by the grid's head dimension — no
   [B, H, L, Dh] tensor ever exists.

Attention-weight dropout (torch nn.MultiheadAttention semantics: dropout on
post-softmax probabilities, train mode only) runs inside the kernel via the
per-core PRNG (pltpu.prng_seed / prng_random_bits); the backward kernel
reseeds with the same per-block seed and regenerates bit-identical masks
(flash-attention style rematerialization), so no Lq*Lk-sized tensor hits HBM
in either direction.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Default q-tile cap. 1024 makes the 982-token decoder grid a SINGLE block
# in both directions — measured 683 -> 645 ms/step at the flagship bench
# point vs 512 (the per-tile softmax/dropout recompute in the backward
# dk/dv accumulation disappears; scripts/ab_attention.py, 2026-08-17).
# Legal at any fwd/bwd tile combination because the dropout bit-stream is
# seeded per absolute 128-row block (see _dropout_mask).
Q_TILE = 1024


def _tile_cap(env_var: str) -> int:
    """Per-direction q-tile cap override (A/B hook): VAESNE_ATTN_QT_FWD /
    VAESNE_ATTN_QT_BWD, read at trace time like VAESNE_PALLAS."""
    v = os.environ.get(env_var)
    if not v:
        return Q_TILE
    cap = int(v)
    if cap % 128:
        raise ValueError(f"{env_var}={cap} must be a multiple of 128")
    return cap


def _q_tile(lq: int, env_var: str, dtype) -> int:
    """Adaptive query tile: the query axis is a LANE axis in the packed
    layout, so tiles are 128-aligned; the cap bounds the per-block VMEM
    temps on the long 982-token decoder grids.

    Default cap 1024 for BOTH dtypes since round 4: the softmax-denominator
    fold removed enough live [qt, Lk] temporaries that the fp32 backward
    now fits scoped VMEM at 1024 rows — measured 729.8 → 808.9 samples/sec
    (+10.8%) on the bench's fp32 leg. The ONE remaining exception:
    fp32 under ``jax_default_matmul_precision=highest`` still adds
    operand-split temporaries that overflow scoped VMEM at 1024 (verified
    2026-08-20: remote compile rejects it), so that combination keeps the
    512 clamp — it is the golden-parity/testing configuration, never the
    production throughput path. An explicit VAESNE_ATTN_QT_* env always
    wins."""
    cap = _tile_cap(env_var)
    if (os.environ.get(env_var) is None
            and jnp.dtype(dtype).itemsize >= 4
            and jax.config.jax_default_matmul_precision == "highest"):
        cap = min(cap, 512)
    return min(cap, max(128, -(-lq // 128) * 128))


def _dropout_bits() -> int:
    """Random-value width for the dropout threshold test (trace-time env
    knob, like the q-tile caps). One PRNG draw is 32 bits; at width w the
    kernel draws 128*w/32 sublanes of uint32 per 128-row block and bitcasts
    to 128 sublanes of uint{w} — so 16/8 cut the PRNG work 2x/4x. The cost
    is keep-probability resolution: the drop rate is quantized to 1/2^w
    (w=16: |err| <= 7.6e-6, far below run-to-run sampling noise; w=8:
    <= 2e-3, e.g. rate 0.1 -> 26/256 = 0.1016).

    Default 8: measured end-to-end at the bench point (flagship MMVAE,
    B=512, bf16, 2026-08-19, scripts/ab_attention.py): 585.4 ms/step vs
    601.5 (w=16) vs 628.7 (w=32) — +7.4% throughput over 32. All widths
    pass the on-hardware property suite (scripts/check_kernel_tpu.py:
    keep-rate statistics, fwd+bwd q-tile invariance, fwd/bwd mask
    agreement); the w=8 rate quantization (<= 2e-3) is far below any
    effect observable in training dynamics. Set 32 to reproduce pre-flip
    runs exactly."""
    w = int(os.environ.get("VAESNE_DROPOUT_BITS", "8"))
    if w not in (8, 16, 32):
        raise ValueError(f"VAESNE_DROPOUT_BITS={w} must be 8, 16 or 32")
    return w


_UDTYPE = {8: jnp.uint8, 16: jnp.uint16, 32: jnp.uint32}


def _single_draw(lq: int, dtype) -> bool:
    """True when the dropout bits for a whole q-tile may be drawn with ONE
    ``prng_seed`` + ``prng_random_bits`` call instead of ``qt/128`` per-row-
    block rounds (round-5 fast path; VERDICT r4 #2).

    The per-128-row-block stream exists to make the mask invariant to the
    query tiling, which is what legalizes ASYMMETRIC fwd/bwd q-tiles. When
    both directions resolve to the SAME tile size — the shipped default:
    1024/1024 (bf16 and fp32), 512/512 under matmul_precision=highest —
    forward and backward enumerate identical (batch, head, tile) blocks, so
    seeding once per tile regenerates bit-identical masks in both
    directions without any cross-tiling invariance requirement.

    ``VAESNE_DROPOUT_DRAW=block`` forces the per-row-block stream (trace-
    time knob, for A/B and for reproducing round-≤4 bit-streams exactly).
    Measured at the bench point (B=192, 2026-08-20, fresh bench.py run per
    arm on the same chip): single-draw 1013.7 vs block 991.9 samples/sec
    bf16 (+2.2%); fp32 901.4 vs 886.5 (+1.7%)."""
    mode = os.environ.get("VAESNE_DROPOUT_DRAW", "auto")
    if mode not in ("auto", "block"):
        raise ValueError(
            f"VAESNE_DROPOUT_DRAW={mode!r} must be 'auto' or 'block'")
    if mode == "block":
        return False
    return (_q_tile(lq, "VAESNE_ATTN_QT_FWD", dtype)
            == _q_tile(lq, "VAESNE_ATTN_QT_BWD", dtype))


def _hash_bits(block_seed, shape):
    """Software counter-based bits (murmur3-style finalizer) for interpret
    mode: the TPU-interpret emulator returns all-zero ``prng_random_bits``,
    which would make every CPU dropout test vacuous (all-drop masks). Bits
    are a pure function of (block seed, row, col) — the same invariance
    contract as the hardware stream."""
    i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (block_seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         ^ (i + jnp.uint32(1)) * jnp.uint32(0x85EBCA6B)
         ^ (j + jnp.uint32(1)) * jnp.uint32(0xC2B2AE35))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _dropout_mask(seed_ref, shape, rate, qt, interpret, single_draw=False):
    """Regenerate the dropout keep-mask for this query tile.

    Bits are generated per absolute 128-row block — seeded by (batch, head,
    absolute-row-block), NOT by the q-tile index — so the mask stream is
    invariant to the query tiling: forward and backward may legally run
    different q-tile sizes (VAESNE_ATTN_QT_FWD/_BWD) and still regenerate
    bit-identical masks without storing them.

    ``single_draw`` (legal only when fwd and bwd tiles are equal — see
    ``_single_draw``) collapses the ``qt/128`` seed+draw rounds into ONE
    hardware draw for the whole tile, seeded at the tile's first row-block
    slot of the same namespace. The stream differs from the per-block one
    (one long draw vs concatenated short draws), which is fine: the only
    contract is fwd/bwd agreement, and both directions take this branch.

    ``VAESNE_DROPOUT_BITS`` (default 8) sets the random-value width: one
    hardware draw is 32 bits, so width w generates 128*w/32 uint32 sublanes
    per 128-row block and bitcasts to 128 sublanes of uint{w} — 16/8 cut
    the PRNG work 2x/4x vs 32 at a drop-rate quantization of 1/2^w
    (see ``_dropout_bits``).
    """
    b, h, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    base = b * pl.num_programs(1) + h
    nrb = qt // 128  # qt is 128-aligned (_q_tile)
    w = _dropout_bits()
    # keep iff bits >= threshold: drop probability = round(rate*2^w) / 2^w
    thr = min(round(rate * 2.0**w), 2**w - 1)
    if single_draw:
        # one seed+draw for the whole [qt, Lk] tile (shape[0] == qt)
        block_seed = seed_ref[0] + base * 1024 + t * nrb
        if interpret:
            bits32 = _hash_bits(block_seed, shape)
            bits = (bits32 >> (32 - w)).astype(_UDTYPE[w])
        else:
            pltpu.prng_seed(block_seed)
            draws = pltpu.prng_random_bits((qt * w // 32, shape[1]))
            bits = pltpu.bitcast(draws, _UDTYPE[w])
        if w == 32 or interpret:
            return bits >= _UDTYPE[w](thr)
        return bits.astype(jnp.int32) >= jnp.int32(thr)
    rows = []
    for i in range(nrb):
        # row-block stride 1024 gives each (batch, head) a tiling-
        # independent seed namespace; supports Lq up to 128*1024 tokens
        block_seed = seed_ref[0] + base * 1024 + t * nrb + i
        if interpret:
            bits32 = _hash_bits(block_seed, (128, shape[1]))
            rows.append((bits32 >> (32 - w)).astype(_UDTYPE[w]))
        else:
            pltpu.prng_seed(block_seed)
            draws = pltpu.prng_random_bits((128 * w // 32, shape[1]))
            # uint32 -> uint{w} bitcast scales the sublane dim back to 128
            rows.append(pltpu.bitcast(draws, _UDTYPE[w]))
    bits = rows[0] if nrb == 1 else jnp.concatenate(rows, axis=0)
    if w == 32 or interpret:
        return bits >= _UDTYPE[w](thr)
    # Mosaic has no compare (signed or unsigned) on packed narrow (i16/i8)
    # vectors ("Target does not support this comparison"): zero-extend to
    # i32 and compare there. The win of a narrow width is fewer PRNG draws;
    # the extend is one cheap VPU convert per element.
    return bits.astype(jnp.int32) >= jnp.int32(thr)


def _valid_mask(lq, qt, shape, axis):
    """Full-shape boolean mask: True where the query position along ``axis``
    is within range. Built at the consumer's exact shape (no broadcasting of
    sub-shaped boolean vectors — Mosaic cannot relayout replicated i1 dims
    under bf16).

    Edge tiles (and the 128-alignment padding of short grids) contain
    out-of-range query positions whose q/do data is undefined; their
    contributions MUST be zeroed out of the dk/dv accumulations."""
    t = pl.program_id(2)
    pos = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return pos + t * qt < lq


def _ab_unfold() -> bool:
    """A/B-ONLY trace-time knob (``VAESNE_AB_UNFOLD=1``): apply the dropout
    1/(1-rate) rescale elementwise on the [qt, Lk] probability tiles instead
    of folding it onto matmul outputs/scalars — the exact variant the folded
    default replaced, kept so ``scripts/ab_attention.py`` can measure the
    fold's end-to-end delta honestly. Never set in production."""
    from .dispatch import env_flag

    return env_flag("VAESNE_AB_UNFOLD", False)


LOG2E = 1.4426950408889634  # log2(e)


def _use_delta() -> bool:
    """Trace-time knob (``VAESNE_DELTA``): compute the backward's per-row
    softmax correction with the flash-attention delta identity instead of a
    full logit-volume reduce.

    Identity (per query row j, with o the FORWARD output and the kernel's
    own scalings): ``Σ_d do[d,j]·o[d,j] = inv·rdenom_j·Σ_l e_keep∘dp_drop``
    — i.e. the row factor ``rs`` the folded backward needs equals
    ``dot(do, o)/inv`` computed over the tiny [Dh, qt] tensors. This
    removes the ``t_ = e∘u`` full-volume multiply, its [qt, Lk] reduce,
    and one more full-volume multiply from ``ds`` (now ``e∘(u − rs)``) —
    ~3 of the backward's full-volume VPU passes. Costs: the forward output
    is stashed as a residual (same size as q; zero recompute).

    Default ON. Measured at the bench point (2026-08-20, repeated runs —
    single-run noise on the tunneled chip is ~±0.5%): delta arms 1033.4 /
    1028.9 / 1028.5 / 1021.4 vs no-delta 1023.7 / 1019.2 samples/sec —
    ~+0.7% mean, never below the control. ``VAESNE_DELTA=0`` restores the
    t_-reduce backward."""
    from .dispatch import env_flag

    return env_flag("VAESNE_DELTA", True)


def _use_exp2() -> bool:
    """Trace-time knob (``VAESNE_EXP2``, default ON): compute the softmax
    numerator as ``exp2(s·log2e − max(s·log2e))`` with log2e pre-folded
    into the QKᵀ matmul scalar (and onto the [Lk] bias vector — one tiny
    pass, not a logit-volume one). Mathematically identical to
    ``exp(s − max)``; the point is to skip the x·log2e full-volume multiply
    the VPU's exp lowering otherwise performs per element. Measured at the
    bench point (2026-08-20, fresh run per arm, same chip): 1023.7 vs
    1012.5 samples/sec bf16 (+1.1%). ``VAESNE_EXP2=0`` restores the exp
    numerator bit-stream."""
    from .dispatch import env_flag

    return env_flag("VAESNE_EXP2", True)


def _ab_divide() -> bool:
    """A/B-ONLY trace-time knob (``VAESNE_AB_DIVIDE=1``): normalize the
    softmax with a full [qt, Lk] divide instead of folding 1/rowsum onto
    the [Dh, qt] matmul output — the exact variant the folded default
    replaced (round 4), kept so the fold's delta stays measurable. Never
    set in production."""
    from .dispatch import env_flag

    return env_flag("VAESNE_AB_DIVIDE", False)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                rate, lq, qt, interpret=False, single_draw=False):
    q = q_ref[0]  # [Dh, qt]   (packed-transposed layout)
    k = k_ref[0]  # [Dh, Lk]
    v = v_ref[0]
    bias = bias_ref[0, 0]  # [Lk]
    dh = q.shape[0]
    unfold = rate > 0.0 and _ab_unfold()
    divide = _ab_divide()
    exp2 = _use_exp2() and not divide
    # exp2 path: pre-fold log2e into the matmul scalar + the [Lk] bias so
    # the numerator is a native exp2 with no logit-volume multiply
    smul = (LOG2E if exp2 else 1.0) / math.sqrt(dh)
    s = jax.lax.dot_general(
        q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * smul  # [qt, Lk]
    s = s + (bias * LOG2E if exp2 else bias)[None, :]
    if divide:
        p = jax.nn.softmax(s, axis=-1)
    else:
        # softmax numerator only: the 1/rowsum normalization is folded onto
        # the [Dh, qt] matmul output below (Lk/Dh = 123x fewer ops at
        # Lk=982) — dropout zeroes the SAME Bernoulli entries either way,
        # and the row normalizer uses the pre-drop sum exactly as torch
        # does (dropout acts on normalized probabilities)
        z = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(z) if exp2 else jnp.exp(z)
        denom = jnp.sum(p, axis=-1)  # [qt], in [1, Lk] — never overflows
    if rate > 0.0:
        keep = _dropout_mask(seed_ref, p.shape, rate, qt, interpret,
                             single_draw)
        p = jnp.where(keep, p, 0.0)
        if unfold:  # A/B-only: rescale on the [qt, Lk] probabilities
            p = p * (1.0 / (1.0 - rate))
    # o [Dh, qt] = v [Dh, Lk] @ p^T [Lk, qt]; the dropout 1/(1-rate)
    # rescale is folded onto the [Dh, qt] matmul output instead of the
    # [qt, Lk] probabilities — 123x fewer multiplies at Lk=982, Dh=8
    o = jax.lax.dot_general(
        v, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    inv = 1.0 / (1.0 - rate) if (rate > 0.0 and not unfold) else 1.0
    if divide:
        if inv != 1.0:
            o = o * inv
    else:
        o = o * (inv / denom)[None, :]
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                *refs, rate, lq, qt, interpret=False,
                single_draw=False, delta=False):
    o_ref = refs[0] if delta else None
    dq_ref, dk_ref, dv_ref = refs[-3:]
    # q/do columns beyond lq hold undefined data (can be NaN/inf): zero at
    # load so 0-weighted contributions stay 0 (0*NaN == NaN).
    vcol = _valid_mask(lq, qt, q_ref[0].shape, 1)  # [Dh, qt]
    q = jnp.where(vcol, q_ref[0], 0.0)
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0, 0]
    do = jnp.where(vcol, do_ref[0], 0.0)
    dh = q.shape[0]
    scale = 1.0 / math.sqrt(dh)
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    unfold = rate > 0.0 and _ab_unfold()
    # exp2 numerator (see _use_exp2) — folded path only; the A/B reference
    # branch below recomputes a true softmax and needs the unscaled s
    exp2 = _use_exp2() and not (_ab_divide() or unfold)
    s = jax.lax.dot_general(
        q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * ((LOG2E if exp2 else 1.0) * scale)
    s = s + (bias * LOG2E if exp2 else bias)[None, :]
    # dp_drop [qt, Lk] = do^T v  (contract Dh)
    dp_drop = jax.lax.dot_general(
        do, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    if _ab_divide() or unfold:
        # A/B-only reference path: full [qt, Lk] softmax divide + the
        # (optionally unfolded) dropout rescales — the pre-round-4 body.
        vrow = _valid_mask(lq, qt, s.shape, 0)  # [qt, Lk]
        p = jax.nn.softmax(s, axis=-1)  # recomputed, [qt, Lk]
        if rate > 0.0:
            keep = _dropout_mask(seed_ref, p.shape, rate, qt, interpret,
                                 single_draw)
            p_masked = jnp.where(keep, p, 0.0)  # p_drop sans inv rescale
            if unfold:  # elementwise [qt, Lk] rescales, no folding
                p_masked = p_masked * inv
            dp = jnp.where(keep, dp_drop, 0.0)
            if unfold:
                dp = dp * inv
        else:
            p_masked = p
            dp = dp_drop
        p_acc = jnp.where(vrow, p_masked, 0.0)
        # dp enters the softmax backward linearly, so the dropout inv
        # rescale folds into the scalar (scale * inv), never a [qt, Lk] mul
        ds_scale = scale if unfold else scale * inv
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * ds_scale
        ds = jnp.where(vrow, ds, 0.0)
        dq_ref[0] = jax.lax.dot_general(
            k, ds, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[0] += jax.lax.dot_general(
            q, ds, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)
        dv = jax.lax.dot_general(
            do, p_acc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0 and not unfold:
            dv = dv * inv
        dv_ref[0] += dv.astype(dv_ref.dtype)
        return

    # Folded default (round 4): work with the softmax NUMERATOR e and fold
    # every per-row 1/denom — and the dropout inv — onto [Dh, qt]-shaped
    # column scalings around the matmuls. Identities (p = e/denom, dp =
    # keep∘dp_drop, both per row j):
    #   ds_j = p∘(dp − Σ dp∘p)·scale·inv = (e∘u − e·rs_j)·(scale·inv/denom_j)
    #     where u = keep∘dp_drop (so e∘u = e_keep∘dp_drop = denom·p∘dp)
    #   dv[:,l] = Σ_j do[:,j]·(keep∘e)[j,l]·inv/denom_j → scale do columns
    #   dq[:,j] (col j) and dk via q columns carry ds's row factor c_j.
    # Eliminates the [qt, Lk] softmax divide and one where/mul pass.
    z = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(z) if exp2 else jnp.exp(z)
    rdenom = 1.0 / jnp.sum(e, axis=-1)  # [qt]; denom in [1, Lk]
    if rate > 0.0:
        keep = _dropout_mask(seed_ref, e.shape, rate, qt, interpret,
                             single_draw)
        e_keep = jnp.where(keep, e, 0.0)
        u = jnp.where(keep, dp_drop, 0.0)
    else:
        e_keep = e
        u = dp_drop
    if delta:
        # flash-attention delta identity: Σ_l (e_keep∘dp_drop)·rdenom per
        # row equals dot(do, o)/inv over the TINY [Dh, qt] tensors — no
        # t_ = e∘u full-volume multiply, no [qt, Lk] reduce (see
        # _use_delta). o at invalid query cols can be NaN (garbage q went
        # through exp in the forward): zero like do so 0·NaN never forms.
        o = jnp.where(vcol, o_ref[0].astype(jnp.float32), 0.0)
        rs = jnp.sum(do.astype(jnp.float32) * o, axis=0) * (1.0 / inv)  # [qt]
        ds_un = e * (u - rs[:, None])
    else:
        t_ = e * u  # e∘dp (dp without inv; inv folds into c below)
        rs = jnp.sum(t_, axis=-1) * rdenom  # [qt] = Σ dp∘p per row
        ds_un = t_ - e * rs[:, None]
    # NO [qt, Lk] row-validity selects here (round 5; the A/B branch keeps
    # them): they are provably redundant. Invalid query rows have q and do
    # zeroed at load (vcol), so s = bias there, e is finite, denom >= 1
    # (max-subtraction guarantees one e == 1) => rdenom, rs, ds_un are all
    # FINITE at invalid rows; dk = Σ_j (q·c)[·,j] ds_un[j,·] and
    # dv = Σ_j (do·s')[·,j] e_keep[j,·] contract over j with zero factors
    # there, and dq's invalid columns fall outside the block's array bounds
    # (the OOB write is discarded). Pinned on real hardware by the
    # scripts/check_kernel_tpu.py directional-derivative checks at
    # Lq=982 < qt=1024 (garbage VMEM in the padding region).
    c = (scale * inv) * rdenom  # [qt] per-row factor of ds
    dq_ref[0] = (jax.lax.dot_general(
        k, ds_un, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * c[None, :]).astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(
        q * c[None, :], ds_un, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)
    dv_ref[0] += jax.lax.dot_general(
        do * (inv * rdenom)[None, :], e_keep, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)


def _specs(dh, Lk, qt):
    # E-axis block = one head (Dh rows); sequence whole (k/v) or tiled (q)
    qspec = pl.BlockSpec((1, dh, qt), lambda b, h, t: (b, h, t),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, dh, Lk), lambda b, h, t: (b, h, 0),
                         memory_space=pltpu.VMEM)
    # bias travels as [B, 1, Lk] so its last two block dims match array dims
    bspec = pl.BlockSpec((1, 1, Lk), lambda b, h, t: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return qspec, kspec, bspec, sspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_attention(q: Array, k: Array, v: Array, bias: Array,
                    num_heads: int,
                    dropout_rate: float = 0.0,
                    interpret: bool = False,
                    seed: Array | None = None) -> Array:
    """Per-head softmax(q_h^T k_h / sqrt(Dh) + bias) applied to v_h, fused.

    PACKED TRANSPOSED layout: q [B, E, Lq]; k, v [B, E, Lk] with
    E = num_heads * Dh (head h occupies rows h*Dh:(h+1)*Dh); bias [B, Lk]
    additive logit bias (0 visible, -1e9 masked). Returns [B, E, Lq].
    ``dropout_rate`` > 0 applies attention-weight dropout inside the kernel
    (requires ``seed``, an int32 scalar; same seed -> same mask).
    """
    return _attention_fwd_impl(q, k, v, bias, num_heads, dropout_rate,
                               interpret, seed)


def _seed_arr(seed):
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(seed, jnp.int32).reshape((1,))


def _fwd_pallas(seed, q, k, v, bias3, num_heads, rate, interpret):
    """The raw forward pallas_call on (per-shard) shapes; bias3 [B, 1, Lk]."""
    B, E, Lq = q.shape
    Lk = k.shape[2]
    dh = E // num_heads
    qt = _q_tile(Lq, "VAESNE_ATTN_QT_FWD", q.dtype)
    n_tiles = pl.cdiv(Lq, qt)
    qspec, kspec, bspec, sspec = _specs(dh, Lk, qt)
    kernel = functools.partial(_fwd_kernel, rate=rate, lq=Lq, qt=qt,
                               interpret=bool(interpret),
                               single_draw=_single_draw(Lq, q.dtype))
    return pl.pallas_call(
        kernel,
        grid=(B, num_heads, n_tiles),
        in_specs=[sspec, qspec, kspec, kspec, bspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(seed, q, k, v, bias3)


def _bwd_pallas(seed, q, k, v, bias3, do, o, num_heads, rate, interpret):
    """The raw backward pallas_call on (per-shard) shapes; bias3 [B, 1, Lk].

    ``o`` is the forward output residual for the delta-trick row correction
    (``_use_delta``) — pass None to run the t_-reduce formulation (the
    operand is then never DMA'd)."""
    B, E, Lq = q.shape
    Lk = k.shape[2]
    dh = E // num_heads
    qt = _q_tile(Lq, "VAESNE_ATTN_QT_BWD", q.dtype)
    n_tiles = pl.cdiv(Lq, qt)
    qspec, kspec, bspec, sspec = _specs(dh, Lk, qt)
    delta = o is not None
    kernel = functools.partial(_bwd_kernel, rate=rate, lq=Lq, qt=qt,
                               interpret=bool(interpret),
                               single_draw=_single_draw(Lq, q.dtype),
                               delta=delta)
    return pl.pallas_call(
        kernel,
        grid=(B, num_heads, n_tiles),
        in_specs=[sspec, qspec, kspec, kspec, bspec, qspec]
        + ([qspec] if delta else []),
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
    )(seed, q, k, v, bias3, do, *((o,) if delta else ()))


def _seed_lower_fn(inner, mesh, axes, local_b, local_heads, rate):
    """Wrap a per-shard lowering so each shard's dropout bit-stream is
    disjoint: the kernel seeds per (LOCAL batch, local head, row-block) with
    namespace width local_b*local_heads*1024 (see _dropout_mask), so offset
    the seed by the shard's linearized mesh index — over the batch AND
    head-shard axes — times that width."""
    from .partition import shard_index

    def lower(seed, *args):
        if rate > 0.0 and axes:
            stride = jnp.int32(local_b * local_heads * 1024)
            seed = seed + shard_index(mesh, axes) * stride
        return inner(seed, *args)

    return lower


def _shard_axes(mesh, arg_shapes, num_heads):
    """(axes_b, axes_e, local_b, heads_local) from the q operand's sharding.

    Dim 0 (batch) sharding is always kept. Dim 1 (packed E = heads*Dh)
    sharding is kept only when the shard count divides ``num_heads`` — a
    whole-head split, each shard running its own heads with a local per-head
    softmax (the Megatron q/k/v layout from parallel/tp.py). A mid-head
    split cannot run locally (softmax normalizes over a head's full Lk row
    with all of its Dh channels present), so E falls back to replicated."""
    from .partition import axes_on_dim, n_shards

    qsh = arg_shapes[1].sharding
    axes_b = axes_on_dim(qsh, 0)
    axes_e = axes_on_dim(qsh, 1)
    if axes_e and num_heads % n_shards(mesh, axes_e):
        axes_e = ()
    heads_local = num_heads // n_shards(mesh, axes_e)
    local_b = arg_shapes[1].shape[0] // n_shards(mesh, axes_b)
    return axes_b, axes_e, local_b, heads_local


def _qkv_sharding(mesh, axes_b, axes_e):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .partition import spec_entry

    return NamedSharding(
        mesh, P(spec_entry(axes_b), spec_entry(axes_e), None))


def _bias_sharding(mesh, axes_b):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .partition import spec_entry

    return NamedSharding(mesh, P(spec_entry(axes_b), None, None))


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(num_heads, rate, interpret):
    """custom_partitioning-wrapped forward: a dp mesh runs each batch
    shard's pallas_call locally instead of all-gathering the global batch,
    and a tp mesh (packed E axis sharded in whole-head slices) runs each
    head shard locally (see ops/partition.py and _shard_axes). Cached per
    static config so the registration happens once per
    (num_heads, rate, interpret)."""
    from jax.experimental.custom_partitioning import custom_partitioning

    from .partition import replicated

    @custom_partitioning
    def fwd(seed, q, k, v, bias3):
        return _fwd_pallas(seed, q, k, v, bias3, num_heads, rate, interpret)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        axes_b, axes_e, _, _ = _shard_axes(mesh, arg_shapes, num_heads)
        return _qkv_sharding(mesh, axes_b, axes_e)

    def partition(mesh, arg_shapes, result_shape):
        axes_b, axes_e, local_b, heads_local = _shard_axes(
            mesh, arg_shapes, num_heads)
        qkv = _qkv_sharding(mesh, axes_b, axes_e)
        arg_shardings = (replicated(mesh), qkv, qkv, qkv,
                         _bias_sharding(mesh, axes_b))
        lower = _seed_lower_fn(
            lambda seed, q, k, v, bias3: _fwd_pallas(
                seed, q, k, v, bias3, heads_local, rate, interpret),
            mesh, axes_b + axes_e, local_b, heads_local, rate)
        return mesh, lower, qkv, arg_shardings

    fwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule="s, b e q, b e m, b e m, b o m -> b e q",
        need_replication_factors=("s", "q", "m", "o"),
    )
    return fwd


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(num_heads, rate, interpret, delta):
    """custom_partitioning-wrapped backward (its own custom call under the
    custom_vjp): same batch + whole-head partitioning as the forward. With
    ``delta`` the forward-output residual rides along as a seventh operand,
    sharded like q."""
    from jax.experimental.custom_partitioning import custom_partitioning

    from .partition import replicated

    if delta:
        @custom_partitioning
        def bwd(seed, q, k, v, bias3, do, o):
            return _bwd_pallas(seed, q, k, v, bias3, do, o, num_heads,
                               rate, interpret)
    else:
        @custom_partitioning
        def bwd(seed, q, k, v, bias3, do):
            return _bwd_pallas(seed, q, k, v, bias3, do, None, num_heads,
                               rate, interpret)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        axes_b, axes_e, _, _ = _shard_axes(mesh, arg_shapes, num_heads)
        s = _qkv_sharding(mesh, axes_b, axes_e)
        return (s, s, s)

    def partition(mesh, arg_shapes, result_shape):
        axes_b, axes_e, local_b, heads_local = _shard_axes(
            mesh, arg_shapes, num_heads)
        s = _qkv_sharding(mesh, axes_b, axes_e)
        arg_shardings = (replicated(mesh), s, s, s,
                         _bias_sharding(mesh, axes_b), s) + ((s,) if delta
                                                             else ())
        out_shardings = (s, s, s)
        if delta:
            def inner(seed, q, k, v, bias3, do, o):
                return _bwd_pallas(seed, q, k, v, bias3, do, o,
                                   heads_local, rate, interpret)
        else:
            def inner(seed, q, k, v, bias3, do):
                return _bwd_pallas(seed, q, k, v, bias3, do, None,
                                   heads_local, rate, interpret)
        lower = _seed_lower_fn(inner, mesh, axes_b + axes_e, local_b,
                               heads_local, rate)
        return mesh, lower, out_shardings, arg_shardings

    bwd.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=("s, b e q, b e m, b e m, b o m, b e q"
                       + (", b e q" if delta else "")
                       + " -> b e q, b e m, b e m"),
        need_replication_factors=("s", "q", "m", "o"),
    )
    return bwd


def _attention_fwd_impl(q, k, v, bias, num_heads, rate, interpret, seed):
    if rate > 0.0 and seed is None:
        raise ValueError("fused_attention: dropout_rate > 0 requires a seed")
    B, E, Lq = q.shape
    if E % num_heads != 0:
        raise ValueError(f"E={E} not divisible by num_heads={num_heads}")
    from .partition import shard_kernels

    if shard_kernels():
        f = _fwd_partitioned(num_heads, float(rate), bool(interpret))
        return f(_seed_arr(seed), q, k, v, bias[:, None, :])
    return _fwd_pallas(_seed_arr(seed), q, k, v, bias[:, None, :],
                       num_heads, rate, interpret)


def _attention_fwd(q, k, v, bias, num_heads, rate, interpret, seed):
    # NB: with nondiff_argnums, jax calls fwd with the PRIMAL signature
    # (nondiff args in their original positions); only bwd gets them first.
    out = _attention_fwd_impl(q, k, v, bias, num_heads, rate, interpret, seed)
    # out rides the residuals for the delta-trick backward (_use_delta);
    # it is alive anyway as the consumer's input, so this costs nothing
    return out, (q, k, v, bias, seed, out)


def _attention_bwd(num_heads, rate, interpret, res, do):
    q, k, v, bias, seed, out = res
    o = out if _use_delta() else None
    from .partition import shard_kernels

    if shard_kernels():
        f = _bwd_partitioned(num_heads, float(rate), bool(interpret),
                             o is not None)
        dq, dk, dv = f(_seed_arr(seed), q, k, v, bias[:, None, :], do,
                       *(() if o is None else (o,)))
    else:
        dq, dk, dv = _bwd_pallas(_seed_arr(seed), q, k, v, bias[:, None, :],
                                 do, o, num_heads, rate, interpret)
    return dq, dk, dv, jnp.zeros_like(bias), None


# custom_vjp with nondiff_argnums: bwd receives the nondiff args first
fused_attention.defvjp(_attention_fwd, _attention_bwd)


def attention_reference(q, k, v, bias):
    """Pure-XLA reference implementation over [B, H, L, Dh] tensors (same
    math, unfused, no dropout)."""
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
    s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def pack_heads(x: Array) -> Array:
    """[B, H, L, Dh] -> packed-transposed [B, H*Dh, L] (test/debug helper)."""
    B, H, L, Dh = x.shape
    return x.transpose(0, 1, 3, 2).reshape(B, H * Dh, L)


def unpack_heads(x: Array, num_heads: int) -> Array:
    """packed-transposed [B, E, L] -> [B, H, L, Dh] (test/debug helper)."""
    B, E, L = x.shape
    dh = E // num_heads
    return x.reshape(B, num_heads, dh, L).transpose(0, 1, 3, 2)
