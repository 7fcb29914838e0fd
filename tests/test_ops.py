"""Pallas kernel tests (interpret mode on CPU) against XLA references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaesne_tpu.ops import (
    attention_reference,
    fused_attention,
    masked_laplace_loglik,
    masked_laplace_loglik_reference,
)
from vaesne_tpu.ops.attention import pack_heads, unpack_heads


def fused_bhld(q, k, v, bias, rate=0.0, interpret=True, seed=None):
    """Run the packed-layout kernel from [B, H, L, Dh] test tensors."""
    H = q.shape[1]
    out = fused_attention(pack_heads(q), pack_heads(k), pack_heads(v), bias,
                          H, rate, interpret, seed)
    return unpack_heads(out, H)


def _attn_inputs(key, B=2, H=2, Lq=4, Lk=16, Dh=8):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, H, Lq, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, Lk, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, Lk, Dh), jnp.float32)
    mask = jax.random.uniform(ks[3], (B, Lk)) < 0.3
    bias = jnp.where(mask, -1e9, 0.0).astype(jnp.float32)
    return q, k, v, bias


def test_fused_attention_matches_reference(key):
    q, k, v, bias = _attn_inputs(key)
    out = fused_bhld(q, k, v, bias)
    ref = attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_attention_gradients_match(key):
    q, k, v, bias = _attn_inputs(key, B=1, H=2, Lq=3, Lk=8, Dh=4)

    def loss_fused(q, k, v):
        return jnp.sum(fused_bhld(q, k, v, bias) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, bias) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_attention_fully_masked_rows_finite(key):
    q, k, v, _ = _attn_inputs(key, B=1, H=1, Lq=2, Lk=4)
    bias = jnp.full((1, 4), -1e9, jnp.float32)
    out = fused_bhld(q, k, v, bias)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_masked_laplace_loglik_matches_reference(key):
    R, N = 10, 37
    ks = jax.random.split(key, 3)
    loc = jax.random.normal(ks[0], (R, N), jnp.float32)
    x = jax.random.normal(ks[1], (R, N), jnp.float32)
    mask = jax.random.uniform(ks[2], (R, N)) < 0.25
    out = masked_laplace_loglik(loc, x, mask, 1e8, True)
    ref = masked_laplace_loglik_reference(loc, x, mask, 1e8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_masked_laplace_loglik_grad_matches(key):
    R, N = 6, 16
    ks = jax.random.split(key, 3)
    loc = jax.random.normal(ks[0], (R, N), jnp.float32)
    x = jax.random.normal(ks[1], (R, N), jnp.float32)
    mask = jax.random.uniform(ks[2], (R, N)) < 0.25

    g_fused = jax.grad(lambda l: masked_laplace_loglik(l, x, mask, 1e8, True).sum())(loc)
    g_ref = jax.grad(lambda l: masked_laplace_loglik_reference(l, x, mask, 1e8).sum())(loc)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-5)


def test_masked_laplace_loglik_row_remainder(key):
    """Row count not divisible by the tile must still be exact."""
    R, N = 13, 8  # 13 % 8 != 0
    loc = jax.random.normal(key, (R, N), jnp.float32)
    x = jnp.zeros((R, N), jnp.float32)
    mask = jnp.zeros((R, N), bool)
    out = masked_laplace_loglik(loc, x, mask, 1e10, True)
    ref = masked_laplace_loglik_reference(loc, x, mask, 1e10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_dropout_mask_tile_invariant(key, monkeypatch):
    """The per-row-block dropout bit-stream is seeded per absolute 128-row
    block (NOT per q-tile), so the forward output must be bit-identical
    across q-tile choices — the property that legalizes asymmetric fwd/bwd
    tiles (VAESNE_ATTN_QT_FWD/_BWD). Pinned to DRAW=block: the round-5
    single-draw fast path is tile-DEPENDENT by design and only legal when
    fwd==bwd tiles (covered by test_dropout_single_draw_* below)."""
    monkeypatch.setenv("VAESNE_DROPOUT_DRAW", "block")
    q, k, v, bias = _attn_inputs(key, B=1, H=2, Lq=300, Lk=64, Dh=8)
    monkeypatch.setenv("VAESNE_ATTN_QT_FWD", "128")
    a = fused_bhld(q, k, v, bias, rate=0.4, seed=jnp.int32(7))
    monkeypatch.setenv("VAESNE_ATTN_QT_FWD", "384")
    b = fused_bhld(q, k, v, bias, rate=0.4, seed=jnp.int32(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # sanity: the mask is actually applied
    c = fused_bhld(q, k, v, bias, rate=0.0)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_dropout_bwd_mask_matches_fwd(key, monkeypatch):
    """Attention output is LINEAR in v for a fixed dropout mask, so the
    backward kernel's directional derivative must equal the exact central
    difference — this fails if forward and backward regenerate different
    masks (the risk of asymmetric q-tiling)."""
    q, k, v, bias = _attn_inputs(key, B=1, H=2, Lq=300, Lk=64, Dh=8)
    monkeypatch.setenv("VAESNE_ATTN_QT_FWD", "384")
    monkeypatch.setenv("VAESNE_ATTN_QT_BWD", "128")

    def loss(v):
        return jnp.sum(fused_bhld(q, k, v, bias, rate=0.4, seed=jnp.int32(3)))

    g = jax.grad(loss)(v)
    d = jax.random.normal(key, v.shape)
    eps = 1e-2
    lhs = (loss(v + eps * d) - loss(v - eps * d)) / (2 * eps)
    rhs = jnp.vdot(g, d)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_dropout_single_draw_selection(monkeypatch):
    """The single-draw fast path engages exactly when fwd and bwd q-tiles
    resolve equal, and VAESNE_DROPOUT_DRAW=block always disables it."""
    from vaesne_tpu.ops.attention import _single_draw

    monkeypatch.delenv("VAESNE_ATTN_QT_FWD", raising=False)
    monkeypatch.delenv("VAESNE_ATTN_QT_BWD", raising=False)
    monkeypatch.delenv("VAESNE_DROPOUT_DRAW", raising=False)
    # defaults: equal caps in every dtype/precision combination
    assert _single_draw(982, jnp.bfloat16)
    assert _single_draw(982, jnp.float32)
    monkeypatch.setenv("VAESNE_ATTN_QT_FWD", "384")
    monkeypatch.setenv("VAESNE_ATTN_QT_BWD", "128")
    assert not _single_draw(300, jnp.float32)
    monkeypatch.setenv("VAESNE_ATTN_QT_BWD", "384")
    assert _single_draw(300, jnp.float32)
    monkeypatch.setenv("VAESNE_DROPOUT_DRAW", "block")
    assert not _single_draw(300, jnp.float32)
    monkeypatch.setenv("VAESNE_DROPOUT_DRAW", "bogus")
    with pytest.raises(ValueError, match="DROPOUT_DRAW"):
        _single_draw(300, jnp.float32)


def test_dropout_single_draw_bwd_mask_matches_fwd(key, monkeypatch):
    """Single-draw path (equal fwd/bwd tiles, multi-row-block tile): the
    backward must regenerate the forward's mask bit-identically — checked
    via the exact directional derivative (output linear in v for a fixed
    mask). Exercises qt=256 (two 128-row blocks in ONE draw) so a
    seed-namespace mistake between the paths would show."""
    q, k, v, bias = _attn_inputs(key, B=1, H=2, Lq=300, Lk=64, Dh=8)
    monkeypatch.setenv("VAESNE_ATTN_QT_FWD", "256")
    monkeypatch.setenv("VAESNE_ATTN_QT_BWD", "256")
    monkeypatch.delenv("VAESNE_DROPOUT_DRAW", raising=False)

    def loss(v):
        return jnp.sum(fused_bhld(q, k, v, bias, rate=0.4, seed=jnp.int32(3)))

    g = jax.grad(loss)(v)
    d = jax.random.normal(key, v.shape)
    eps = 1e-2
    lhs = (loss(v + eps * d) - loss(v - eps * d)) / (2 * eps)
    rhs = jnp.vdot(g, d)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_dropout_single_draw_keep_rate(key, monkeypatch):
    """Keep-rate statistics hold on the single-draw stream at a
    multi-row-block tile (qt=256)."""
    monkeypatch.setenv("VAESNE_ATTN_QT_FWD", "256")
    monkeypatch.setenv("VAESNE_ATTN_QT_BWD", "256")
    monkeypatch.delenv("VAESNE_DROPOUT_DRAW", raising=False)
    rate = 0.3
    q, k, v, bias = _attn_inputs(key, B=1, H=1, Lq=256, Lk=300, Dh=4)
    v = jnp.ones_like(v)
    base = fused_bhld(q, k, v, bias, rate=0.0)
    drop = fused_bhld(q, k, v, bias, rate=rate, seed=jnp.int32(11))
    w = 8  # suite default width
    expected_keep = 1.0 - round(rate * 2.0**w) / 2.0**w
    realized = float(jnp.sum(drop) * (1.0 - rate) / jnp.sum(base))
    assert abs(realized - expected_keep) < 0.02, (realized, expected_keep)


@pytest.mark.parametrize("bits", ["8", "16", "32"])
def test_dropout_keep_rate_statistics(key, monkeypatch, bits):
    """At every PRNG width the realized drop fraction must match the
    (width-quantized) rate: E[dropped] = round(rate * 2^w) / 2^w, binomial
    CI over ~38k logits. Catches threshold/bitcast layout mistakes."""
    monkeypatch.setenv("VAESNE_DROPOUT_BITS", bits)
    rate = 0.3
    q, k, v, bias = _attn_inputs(key, B=1, H=1, Lq=128, Lk=300, Dh=4)
    v = jnp.ones_like(v)
    base = fused_bhld(q, k, v, bias, rate=0.0)
    # with v = 1, o_ij = sum_k p_ik: dropping multiplies each kept prob by
    # inv, so sum(o_drop)/inv / sum(o_base) estimates the keep fraction
    # under the p-weighted measure (p is independent of the keep mask)
    drop = fused_bhld(q, k, v, bias, rate=rate, seed=jnp.int32(11))
    w = int(bits)
    expected_keep = 1.0 - round(rate * 2.0**w) / 2.0**w
    realized = float(jnp.sum(drop) * (1.0 - rate) / jnp.sum(base))
    assert abs(realized - expected_keep) < 0.02, (realized, expected_keep)


def test_q_tile_dtype_aware_cap(monkeypatch):
    """Default cap 1024 for both dtypes since round 4; the ONE clamp left
    is fp32 under matmul_precision=highest (scoped-VMEM limit — the
    golden-parity config, which this suite's conftest pins). An explicit
    env override always wins."""
    from vaesne_tpu.ops.attention import _q_tile

    monkeypatch.delenv("VAESNE_ATTN_QT_FWD", raising=False)
    assert jax.config.jax_default_matmul_precision == "highest"  # conftest
    assert _q_tile(982, "VAESNE_ATTN_QT_FWD", jnp.bfloat16) == 1024
    assert _q_tile(982, "VAESNE_ATTN_QT_FWD", jnp.float32) == 512
    assert _q_tile(300, "VAESNE_ATTN_QT_FWD", jnp.float32) == 384
    try:
        # production default precision: fp32 gets 1024 too (round 4 — the
        # softmax-denominator fold freed the backward VMEM)
        jax.config.update("jax_default_matmul_precision", None)
        assert _q_tile(982, "VAESNE_ATTN_QT_FWD", jnp.float32) == 1024
    finally:
        jax.config.update("jax_default_matmul_precision", "highest")
    monkeypatch.setenv("VAESNE_ATTN_QT_FWD", "1024")
    assert _q_tile(982, "VAESNE_ATTN_QT_FWD", jnp.float32) == 1024
    monkeypatch.setenv("VAESNE_ATTN_QT_FWD", "100")
    with pytest.raises(ValueError):
        _q_tile(982, "VAESNE_ATTN_QT_FWD", jnp.float32)


def test_fold_matches_divide_path_with_dropout(key, monkeypatch):
    """Round-4 fold: working with the softmax numerator and folding
    1/rowsum (+ dropout rescale) onto column scalings must reproduce the
    dividing path bit-for-bit up to float reassociation — forward AND all
    three gradients, with dropout active (same seed → same keep masks)."""
    from vaesne_tpu.ops.attention import pack_heads, unpack_heads
    from vaesne_tpu.ops import fused_attention

    q, k, v, bias = _attn_inputs(key, B=2, H=2, Lq=140, Lk=64, Dh=8)
    seed = jnp.int32(77)
    rate = 0.25

    def run():
        def f(q, k, v):
            out = fused_attention(pack_heads(q), pack_heads(k),
                                  pack_heads(v), bias, 2, rate, True, seed)
            return jnp.sum(unpack_heads(out, 2) ** 2)

        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
        return val, grads

    monkeypatch.delenv("VAESNE_AB_DIVIDE", raising=False)
    val_fold, g_fold = run()
    monkeypatch.setenv("VAESNE_AB_DIVIDE", "1")
    val_div, g_div = run()
    np.testing.assert_allclose(float(val_fold), float(val_div), rtol=1e-5)
    for a, b in zip(g_fold, g_div):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fused_attention_query_tiling_edge(key):
    """Lq > Q_TILE and not divisible by it: edge-tile rows must not pollute
    dk/dv accumulation in the backward kernel."""
    from vaesne_tpu.ops import attention as attn_mod
    q, k, v, bias = _attn_inputs(key, B=1, H=1, Lq=attn_mod.Q_TILE + 44, Lk=64, Dh=8)

    def loss_fused(q, k, v):
        return jnp.sum(fused_bhld(q, k, v, bias) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, bias) ** 2)

    np.testing.assert_allclose(
        np.asarray(loss_fused(q, k, v)), np.asarray(loss_ref(q, k, v)), rtol=1e-5
    )
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
