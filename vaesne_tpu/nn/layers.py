"""Core neural building blocks (flax.linen), designed TPU-first.

Capabilities mirrored from the reference's ``util_layers.py``:
  * ``SingleLayerMLP``            (reference util_layers.py:9-18)
  * ``MLP``                       (util_layers.py:20-34)
  * ``SinusoidalEmbedding``       (util_layers.py:113-129; continuous-input
                                   sin/cos over real-valued time/wavelength)
  * ``SinusoidalMLPEmbedding``    (util_layers.py:131-149; DiT-style MLP head)
  * ``sinusoidal_embedding_2d``   (util_layers.py:62-111; fixed image grid)
  * ``PatchEmbedding``            (util_layers.py:399-412)
  * ``MultiHeadAttention``        (the nn.MultiheadAttention semantics used at
                                   util_layers.py:265-271: packed math, key
                                   padding masks where True == ignore)
  * ``TransformerBlock``          (util_layers.py:257-309: post-LN self-attn →
                                   optional context self-attn → cross-attn →
                                   GELU FFN)

Design notes (TPU):
  * Everything is shape-static and jit/vmap friendly; masks are boolean
    tensors folded into attention logits as additive bias (no dynamic
    shapes, no gather/scatter).
  * Attention logits use -1e9 bias instead of -inf so fully-masked rows
    degrade to a uniform distribution instead of NaN (strictly safer than
    the torch behavior, identical output when ≥1 key is visible).
  * LayerNorm eps = 1e-5 and exact (erf) GELU to match torch numerics for
    golden parity tests.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import fused_attention, use_pallas

Array = jax.Array

LN_EPS = 1e-5  # torch nn.LayerNorm default


def compute_dtype():
    """Computation dtype for matmuls/activations (params always fp32).

    VAESNE_BF16=1 switches the forward/backward compute path to bfloat16 —
    the TPU-native mixed precision: MXU throughput doubles and activation
    HBM traffic halves while AdamW still updates fp32 master weights. Off by
    default so golden-parity tests compare fp32 against the torch reference.
    """
    return (jnp.bfloat16
            if os.environ.get("VAESNE_BF16", "0") not in ("0", "false", "False")
            else None)


class SingleLayerMLP(nn.Module):
    """fc(in→in) → ReLU → fc(in→out). Reference: util_layers.py:9-18."""

    out_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = compute_dtype()
        x = nn.relu(nn.Dense(x.shape[-1], dtype=dt, name="fc1")(x))
        return nn.Dense(self.out_dim, dtype=dt, name="fc2")(x)


class MLP(nn.Module):
    """Stack of Dense+ReLU with a linear head. Reference: util_layers.py:20-34."""

    out_dim: int
    hidden_dim: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = compute_dtype()
        for i, h in enumerate(self.hidden_dim):
            x = nn.relu(nn.Dense(h, dtype=dt, name=f"hidden_{i}")(x))
        return nn.Dense(self.out_dim, dtype=dt, name="out")(x)


def _div_term(dim: int, step: int) -> Array:
    """exp(arange(0, dim, step) * (-log(10000) / dim))."""
    return jnp.exp(jnp.arange(0, dim, step, dtype=jnp.float32) * (-math.log(10000.0) / dim))


class SinusoidalEmbedding(nn.Module):
    """Continuous-input sinusoidal embedding: cat[sin(x·ω), cos(x·ω)].

    ``x`` is a real-valued coordinate (time / wavelength), NOT an integer
    position. ω has dim/2 frequencies → output dim = ``dim``.
    Reference: util_layers.py:113-129.
    """

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: [..., seq_len] → [..., seq_len, dim]
        w = _div_term(self.dim, 2)
        ang = x[..., None] * w
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class SinusoidalMLPEmbedding(nn.Module):
    """Sinusoidal features (dim frequencies each for sin/cos → 2·dim) passed
    through fc(2·dim→dim) → ReLU → fc(dim→dim). Reference: util_layers.py:131-149.
    """

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = _div_term(self.dim, 1)
        ang = x[..., None] * w
        enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        dt = compute_dtype()
        enc = nn.relu(nn.Dense(self.dim, dtype=dt, name="fc1")(enc))
        return nn.Dense(self.dim, dtype=dt, name="fc2")(enc)


def sinusoidal_embedding_2d(d_model: int, height: int, width: int) -> Array:
    """Fixed 2D sin-cos grid embedding of shape [H*W, d_model].

    pos_x + pos_y where each is cat[sin(coord·ω), cos(coord·ω)] with
    ω_i = 10000^{-i/(d/2)}, i < d/2. Reference: util_layers.py:62-104.
    """
    if d_model % 4 != 0:
        raise ValueError("d_model must be divisible by 4 for 2D sinusoidal embeddings.")
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    xs, ys = xs.reshape(-1), ys.reshape(-1)
    half = d_model // 2
    omega = 1.0 / (10000.0 ** (jnp.arange(half, dtype=jnp.float32) / half))
    out_x = xs[:, None] * omega[None, :]
    out_y = ys[:, None] * omega[None, :]
    pos_x = jnp.concatenate([jnp.sin(out_x), jnp.cos(out_x)], axis=-1)
    pos_y = jnp.concatenate([jnp.sin(out_y), jnp.cos(out_y)], axis=-1)
    return pos_x + pos_y


class PatchEmbedding(nn.Module):
    """Non-overlapping conv patchifier: [B,H,W,C] → [B, N, embed_dim].

    Reference: util_layers.py:399-412 (Conv2d k=p, stride=p then flatten).
    Input here is NHWC (TPU-native layout); model-level code converts from
    the reference's NCHW contract at the boundary.
    """

    patch_size: int
    embed_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, kernel_size=(p, p), strides=(p, p), padding="VALID", name="proj"
        )(x)  # [B, H/p, W/p, E]
        b, h, w, e = x.shape
        return x.reshape(b, h * w, e)


def _mask_bias(mask: Optional[Array], dtype) -> Optional[Array]:
    """Boolean key-padding mask (True == ignore) → additive logit bias."""
    if mask is None:
        return None
    return jnp.where(mask, jnp.asarray(-1e9, dtype), jnp.asarray(0.0, dtype))


class MultiHeadAttention(nn.Module):
    """Multi-head attention with torch ``nn.MultiheadAttention`` semantics.

    q/k/v/out projections all E→E with bias; scaling 1/sqrt(head_dim);
    ``key_padding_mask`` is boolean [B, Lk] with True == masked (ignored).
    Attention-weight dropout matches the torch placement.
    Reference usage: util_layers.py:265-271, 289-302.

    The einsum formulation (no explicit transposes, batched over heads) maps
    straight onto the MXU; with `vaesne_tpu.ops` enabled the inner
    softmax(QK^T)V is computed by a fused Pallas kernel.
    """

    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query: Array,
        key: Array,
        value: Array,
        key_padding_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        e = query.shape[-1]
        if e % self.num_heads != 0:
            raise ValueError(f"embed dim {e} not divisible by {self.num_heads} heads")
        hd = e // self.num_heads

        dt = compute_dtype()
        q = nn.Dense(e, dtype=dt, name="q_proj")(query)
        k = nn.Dense(e, dtype=dt, name="k_proj")(key)
        v = nn.Dense(e, dtype=dt, name="v_proj")(value)

        rate = self.dropout if (self.dropout > 0.0 and not deterministic) else 0.0
        # Dispatch: the fused kernel wins on large grids where XLA would
        # materialize [B,H,Lq,Lk] probabilities in HBM (982x982: OOM at
        # K*B=1024). Small grids ALWAYS take the XLA path — the kernel's
        # packed layout puts queries on the 128-lane axis, so Lq=8 bottleneck
        # or Lq=60 light-curve grids would pad 16x/2x and waste that much
        # compute (measured honestly with forced device sync: routing small
        # grids to the kernel under dropout cost ~30% of the flagship step).
        # XLA's materialized [B,H,Lq,Lk] probs are tiny there, and its
        # bernoulli dropout matches the torch placement exactly.
        lq, lk = q.shape[-2], k.shape[-2]
        big_grid = lq * lk >= (1 << 16)
        big_total = q.shape[0] * self.num_heads * lq * lk * 4 >= (1 << 28)
        if use_pallas() and q.ndim == 3 and (big_grid or big_total):
            # Fused Pallas path: softmax(QK^T+bias)V (+ in-kernel attention
            # dropout) per (batch, head, q-tile) block — the [Lq, Lk]
            # probability tensor never exists in HBM. IO uses the packed
            # transposed [B, E, L] layout (sequence on the 128-lane axis) so
            # HBM operands carry ~no tile padding (a per-head [B,H,L,8]
            # layout pads 8 lanes → 128: a 16x memory blowup).
            bias = _mask_bias(key_padding_mask, q.dtype)
            if bias is None:
                bias = jnp.zeros(k.shape[:2], q.dtype)  # [B, Lk]
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max
                )
            from ..ops import pallas_interpret

            out = fused_attention(
                q.transpose(0, 2, 1),
                k.transpose(0, 2, 1),
                v.transpose(0, 2, 1),
                bias,
                self.num_heads,
                rate,
                pallas_interpret(),
                seed,
            ).transpose(0, 2, 1)  # [B, Lq, E]
            return nn.Dense(e, dtype=dt, name="out_proj")(out)

        def split(x):  # [B, L, E] → [B, L, H, hd]
            return x.reshape(*x.shape[:-1], self.num_heads, hd)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("...qhd,...khd->...hqk", q, k) / math.sqrt(hd)
        bias = _mask_bias(key_padding_mask, logits.dtype)
        if bias is not None:
            logits = logits + bias[..., None, None, :]
        weights = jax.nn.softmax(logits, axis=-1)
        if rate > 0.0:
            weights = nn.Dropout(rate=rate, name="attn_drop")(
                weights, deterministic=False
            )
        out = jnp.einsum("...hqk,...khd->...qhd", weights, v)
        out = out.reshape(*out.shape[:-2], e)
        return nn.Dense(e, dtype=dt, name="out_proj")(out)


class TransformerBlock(nn.Module):
    """Post-LN transformer block with optional cross-attention context.

    Wiring (reference util_layers.py:285-308):
      x  = LN1(x + drop(SelfAttn(x, key_padding_mask=mask)))
      ctx = LN_ctx(ctx + drop(CtxSelfAttn(ctx)))      # iff context_self_attn
      x  = LN2(x + drop(CrossAttn(x, ctx, key_padding_mask=context_mask)))
      x  = LN3(x + drop(FFN(x)))                      # Dense→GELU→Dense
    """

    embed_dim: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.1
    context_self_attn: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        context: Optional[Array] = None,
        mask: Optional[Array] = None,
        context_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        drop = nn.Dropout(rate=self.dropout)
        dt = compute_dtype()

        attn = MultiHeadAttention(self.num_heads, self.dropout, name="self_attn")(
            x, x, x, key_padding_mask=mask, deterministic=deterministic
        )
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=dt, name="layernorm1")(
            x + drop(attn, deterministic=deterministic)
        )

        if context is not None:
            if self.context_self_attn:
                ctx_attn = MultiHeadAttention(
                    self.num_heads, self.dropout, name="context_self_attn"
                )(context, context, context, key_padding_mask=context_mask,
                  deterministic=deterministic)
                context = nn.LayerNorm(epsilon=LN_EPS, dtype=dt, name="layernorm_context")(
                    context + drop(ctx_attn, deterministic=deterministic)
                )
            cross = MultiHeadAttention(self.num_heads, self.dropout, name="cross_attn")(
                x, context, context, key_padding_mask=context_mask,
                deterministic=deterministic,
            )
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=dt, name="layernorm2")(
                x + drop(cross, deterministic=deterministic)
            )

        h = nn.Dense(self.ff_dim, dtype=dt, name="ffn_0")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.embed_dim, dtype=dt, name="ffn_2")(h)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=dt, name="layernorm3")(
            x + drop(h, deterministic=deterministic)
        )
        return x


class TransformerStack(nn.Module):
    """num_layers TransformerBlocks applied sequentially on (x, context).

    The analog of the reference's nn.ModuleList loops (e.g.
    SpectraLayers.py:36-39,61-62). Layer count is small and static, so plain
    Python unrolling lets XLA fuse freely (no scan overhead needed at depth 4).
    """

    embed_dim: int
    num_heads: int
    ff_dim: int
    num_layers: int
    dropout: float = 0.1
    context_self_attn: bool = False
    # VAESNE_REMAT=0 disables block rematerialization (for memory profiling)
    remat: bool = os.environ.get("VAESNE_REMAT", "1") != "0"

    @nn.compact
    def __call__(
        self,
        x: Array,
        context: Optional[Array] = None,
        mask: Optional[Array] = None,
        context_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        # Rematerialize each block in the backward pass: per-layer attention/
        # FFN activations over the 982-token grids dominate HBM at large
        # K·B; recomputing them trades cheap FLOPs for the usual bottleneck
        # (memory), raising the max batch per chip ~4x.
        block_cls = (
            nn.remat(TransformerBlock, static_argnums=(5,), prevent_cse=False)
            if self.remat
            else TransformerBlock
        )
        for i in range(self.num_layers):
            x = block_cls(
                self.embed_dim,
                self.num_heads,
                self.ff_dim,
                self.dropout,
                self.context_self_attn,
                name=f"block_{i}",
            )(x, context, mask, context_mask, deterministic)
        return x
