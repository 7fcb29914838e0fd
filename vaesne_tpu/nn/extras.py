"""Auxiliary building blocks completing the reference's API surface.

These mirror the utilities in reference ``util_layers.py`` that no model or
script exercises (SURVEY.md C10) — provided so a reference user finds every
name they might depend on, implemented the JAX way (explicit PRNG keys,
static shapes, straight-through via ``stop_gradient``):

  * ``LearnableFourierEncoding``     (util_layers.py:40-59; the reference
    body is broken — ``nn.ReLU(self.fc1(...))`` at util_layers.py:58
    constructs a module instead of applying ReLU — implemented as intended:
    ``fc2(relu(fc1([sin(freq·x), cos(freq·x)])))``)
  * ``RelativePosition``             (util_layers.py:152-173; Shaw-style
    clipped-distance embedding table)
  * ``RelativeMultiHeadAttention``   (util_layers.py:176-255;
    ``MultiHeadAttentionLayer_relative``: relative-position terms added to
    both attention logits (via keys) and values)
  * ``GumbelSoftmax``                (util_layers.py:352-396; linear logits +
    Gumbel-Softmax sample, optional straight-through one-hot)
  * ``flatten`` / ``reshape``        (util_layers.py:339-349; the ``Flatten``
    and ``Reshape`` layers — plain functions here, nothing is stateful)
  * ``TransformerModel``             (util_layers.py:416-429; minimal block
    stack — a thin alias of ``TransformerStack``)
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import TransformerStack, compute_dtype

Array = jax.Array

__all__ = [
    "LearnableFourierEncoding",
    "RelativePosition",
    "RelativeMultiHeadAttention",
    "GumbelSoftmax",
    "flatten",
    "reshape",
    "TransformerModel",
]


class LearnableFourierEncoding(nn.Module):
    """MLP([sin(fc(x)), cos(fc(x))]) positional encoding with learned
    frequencies. Reference: util_layers.py:40-59 (intended behavior; the
    reference applies ``nn.ReLU`` as a constructor at util_layers.py:58)."""

    dim: int = 64

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: [..., seq_len] real coordinates → [..., seq_len, dim]
        dt = compute_dtype()
        ang = nn.Dense(self.dim, use_bias=False, dtype=dt, name="freq")(x[..., None])
        enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        enc = nn.relu(nn.Dense(self.dim, dtype=dt, name="fc1")(enc))
        return nn.Dense(self.dim, dtype=dt, name="fc2")(enc)


class RelativePosition(nn.Module):
    """Clipped-distance relative positional embedding table.

    ``(length_q, length_k) → [Lq, Lk, num_units]`` where entry (i, j) is
    ``table[clip(j - i, ±max) + max]``. Reference: util_layers.py:152-173.
    The distance matrix is static for static lengths, so the gather folds
    into the compiled program.
    """

    num_units: int
    max_relative_position: int

    @nn.compact
    def __call__(self, length_q: int, length_k: int) -> Array:
        table = self.param(
            "embeddings_table",
            nn.initializers.xavier_uniform(),
            (2 * self.max_relative_position + 1, self.num_units),
        )
        dist = jnp.arange(length_k)[None, :] - jnp.arange(length_q)[:, None]
        idx = jnp.clip(dist, -self.max_relative_position, self.max_relative_position)
        return table[idx + self.max_relative_position]


class RelativeMultiHeadAttention(nn.Module):
    """Multi-head attention with Shaw-style relative positions on keys AND
    values: ``logits = (QK^T + Q·R_k^T)/sqrt(hd)``, ``out = A·V + A·R_v``.
    Reference: util_layers.py:176-255 (``MultiHeadAttentionLayer_relative``,
    hardcoded ``max_relative_position = 2`` at util_layers.py:187).

    The relative terms are einsums over the static [Lq, Lk, hd] tables —
    batched MXU matmuls, no per-position gathers in the hot path. ``mask``
    follows the reference convention here: 0/False == masked (ignore),
    broadcastable to [B, H, Lq, Lk].
    """

    num_heads: int
    dropout: float = 0.0
    max_relative_position: int = 2

    @nn.compact
    def __call__(
        self,
        query: Array,
        key: Array,
        value: Array,
        mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        e = query.shape[-1]
        if e % self.num_heads != 0:
            raise ValueError(f"embed dim {e} not divisible by {self.num_heads} heads")
        hd = e // self.num_heads
        lq, lk = query.shape[-2], key.shape[-2]
        dt = compute_dtype()

        q = nn.Dense(e, dtype=dt, name="fc_q")(query)
        k = nn.Dense(e, dtype=dt, name="fc_k")(key)
        v = nn.Dense(e, dtype=dt, name="fc_v")(value)

        def split(x):  # [B, L, E] → [B, L, H, hd]
            return x.reshape(*x.shape[:-1], self.num_heads, hd)

        qh, kh, vh = split(q), split(k), split(v)
        # content term + relative-key term (reference attn1 + attn2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
        r_k = RelativePosition(hd, self.max_relative_position, name="relative_position_k")(lq, lk)
        logits = logits + jnp.einsum("bqhd,qkd->bhqk", qh, r_k)
        logits = logits / math.sqrt(hd)

        if mask is not None:
            logits = jnp.where(mask == 0, jnp.asarray(-1e10, logits.dtype), logits)
        weights = jax.nn.softmax(logits, axis=-1)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(rate=self.dropout, name="attn_drop")(
                weights, deterministic=False
            )

        # content values + relative-value term (reference weight1 + weight2)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh)
        r_v = RelativePosition(hd, self.max_relative_position, name="relative_position_v")(lq, lk)
        out = out + jnp.einsum("bhqk,qkd->bqhd", weights, r_v)
        out = out.reshape(*out.shape[:-2], e)
        return nn.Dense(e, dtype=dt, name="fc_o")(out)


class GumbelSoftmax(nn.Module):
    """Linear logits + Gumbel-Softmax sample, optionally straight-through
    discretized. Returns ``(logits, probs, sample)`` exactly like the
    reference (util_layers.py:390-396). Sampling uses the ``gumbel`` PRNG
    collection instead of global RNG state; the straight-through estimator is
    ``stop_gradient(one_hot - y) + y`` (the JAX spelling of the reference's
    ``(y_hard - y).detach() + y``, util_layers.py:381)."""

    c_dim: int
    eps: float = 1e-20  # reference sample_gumbel eps (util_layers.py:360)

    @nn.compact
    def __call__(
        self,
        x: Array,
        temperature: float = 1.0,
        hard: bool = False,
    ) -> Tuple[Array, Array, Array]:
        logits = nn.Dense(self.c_dim, dtype=compute_dtype(), name="logits")(x)
        logits = logits.reshape(-1, self.c_dim)
        probs = jax.nn.softmax(logits, axis=-1)
        u = jax.random.uniform(self.make_rng("gumbel"), logits.shape,
                               dtype=jnp.float32)
        gumbel = -jnp.log(-jnp.log(u + self.eps) + self.eps)
        y = jax.nn.softmax((logits + gumbel) / temperature, axis=-1)
        if hard:
            one_hot = jax.nn.one_hot(jnp.argmax(y, axis=-1), self.c_dim, dtype=y.dtype)
            y = jax.lax.stop_gradient(one_hot - y) + y
        return logits, probs, y


def flatten(x: Array) -> Array:
    """[B, ...] → [B, prod(...)]. Reference ``Flatten`` (util_layers.py:339)."""
    return x.reshape(x.shape[0], -1)


def reshape(x: Array, outer_shape: Sequence[int]) -> Array:
    """[B, N] → [B, *outer_shape]. Reference ``Reshape`` (util_layers.py:344)."""
    return x.reshape(x.shape[0], *outer_shape)


class TransformerModel(nn.Module):
    """Minimal transformer: ``num_layers`` blocks over (x, context).
    Reference: util_layers.py:416-429 (``selfattn`` there toggles the blocks'
    context self-attention, passed through positionally)."""

    embed_dim: int
    num_heads: int
    ff_dim: int
    num_layers: int
    dropout: float = 0.1
    selfattn: bool = True

    @nn.compact
    def __call__(
        self,
        x: Array,
        context: Optional[Array] = None,
        mask: Optional[Array] = None,
        context_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        return TransformerStack(
            self.embed_dim,
            self.num_heads,
            self.ff_dim,
            self.num_layers,
            self.dropout,
            context_self_attn=self.selfattn,
            name="layers",
        )(x, context, mask, context_mask, deterministic)
