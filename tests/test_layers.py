"""Unit tests for the transformer building blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaesne_tpu.nn import (
    MLP,
    MultiHeadAttention,
    PatchEmbedding,
    SingleLayerMLP,
    SinusoidalEmbedding,
    SinusoidalMLPEmbedding,
    TransformerBlock,
    TransformerStack,
    sinusoidal_embedding_2d,
)


def test_mlp_shapes(key):
    m = MLP(out_dim=5, hidden_dim=(16, 16))
    p = m.init(key, jnp.zeros((2, 7)))
    y = m.apply(p, jnp.ones((2, 7)))
    assert y.shape == (2, 5)


def test_single_layer_mlp_shapes(key):
    m = SingleLayerMLP(out_dim=3)
    p = m.init(key, jnp.zeros((4, 8)))
    assert m.apply(p, jnp.ones((4, 8))).shape == (4, 3)


def test_sinusoidal_embedding_values(key):
    dim = 8
    m = SinusoidalEmbedding(dim)
    x = jnp.asarray([[0.5, -1.2]])
    y = m.apply(m.init(key, x), x)  # no params; init returns empty variables
    # manual: div_term = exp(arange(0, dim, 2) * (-ln 10000 / dim))
    w = np.exp(np.arange(0, dim, 2) * (-np.log(1e4) / dim))
    ang = np.asarray(x)[..., None] * w
    expected = np.concatenate([np.sin(ang), np.cos(ang)], -1)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5)
    assert y.shape == (1, 2, dim)


def test_sinusoidal_embedding_continuous_input():
    """Embedding must accept real-valued (non-integer) coordinates."""
    m = SinusoidalEmbedding(16)
    x = jnp.asarray([[0.123, 4.567, -3.2]])
    y = m.apply({}, x)
    assert y.shape == (1, 3, 16)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_sinusoidal_mlp_embedding(key):
    m = SinusoidalMLPEmbedding(12)
    x = jnp.ones((2, 5))
    p = m.init(key, x)
    assert m.apply(p, x).shape == (2, 5, 12)


def test_sinusoidal_2d_properties():
    emb = sinusoidal_embedding_2d(16, 3, 4)
    assert emb.shape == (12, 16)
    with pytest.raises(ValueError):
        sinusoidal_embedding_2d(6, 3, 4)  # not divisible by 4


def test_patch_embedding(key):
    m = PatchEmbedding(patch_size=4, embed_dim=32)
    x = jnp.ones((2, 16, 16, 3))
    p = m.init(key, x)
    y = m.apply(p, x)
    assert y.shape == (2, 16, 32)  # (16/4)^2 = 16 patches


def test_mha_shapes_and_mask_semantics(key):
    m = MultiHeadAttention(num_heads=4)
    q = jax.random.normal(key, (2, 5, 32))
    kv = jax.random.normal(jax.random.fold_in(key, 1), (2, 9, 32))
    p = m.init(key, q, kv, kv)
    out = m.apply(p, q, kv, kv)
    assert out.shape == (2, 5, 32)

    # masked keys must not influence the output: perturb masked positions
    mask = jnp.zeros((2, 9), bool).at[:, -3:].set(True)
    out1 = m.apply(p, q, kv, kv, key_padding_mask=mask)
    kv2 = kv.at[:, -3:, :].add(100.0)
    out2 = m.apply(p, q, kv2, kv2, key_padding_mask=mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_mha_all_masked_no_nan(key):
    """Unlike torch (-inf → NaN), fully-masked rows stay finite."""
    m = MultiHeadAttention(num_heads=2)
    q = jax.random.normal(key, (1, 3, 16))
    kv = jax.random.normal(key, (1, 4, 16))
    p = m.init(key, q, kv, kv)
    mask = jnp.ones((1, 4), bool)
    out = m.apply(p, q, kv, kv, key_padding_mask=mask)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_transformer_block_shapes(key):
    m = TransformerBlock(embed_dim=32, num_heads=4, ff_dim=64)
    x = jax.random.normal(key, (2, 6, 32))
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (2, 10, 32))
    p = m.init(key, x, ctx)
    out = m.apply(p, x, ctx)
    assert out.shape == x.shape


def test_transformer_block_context_mask(key):
    m = TransformerBlock(embed_dim=16, num_heads=2, ff_dim=16)
    x = jax.random.normal(key, (2, 4, 16))
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 16))
    p = m.init(key, x, ctx)
    cmask = jnp.zeros((2, 8), bool).at[:, :2].set(True)
    out1 = m.apply(p, x, ctx, None, cmask)
    ctx2 = ctx.at[:, :2].mul(-7.0)
    out2 = m.apply(p, x, ctx2, None, cmask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_transformer_block_context_self_attn_param_structure(key):
    m = TransformerBlock(embed_dim=16, num_heads=2, ff_dim=16, context_self_attn=True)
    x = jnp.ones((1, 2, 16))
    ctx = jnp.ones((1, 3, 16))
    p = m.init(key, x, ctx)
    assert "context_self_attn" in p["params"]
    assert m.apply(p, x, ctx).shape == x.shape


def test_transformer_stack_depth(key):
    m = TransformerStack(embed_dim=16, num_heads=2, ff_dim=16, num_layers=3)
    x = jnp.ones((1, 2, 16))
    p = m.init(key, x)
    assert len([k for k in p["params"] if k.startswith("block_")]) == 3


def test_dropout_active_only_when_not_deterministic(key):
    m = TransformerBlock(embed_dim=16, num_heads=2, ff_dim=16, dropout=0.5)
    x = jax.random.normal(key, (2, 4, 16))
    p = m.init(key, x)
    d1 = m.apply(p, x, deterministic=True)
    d2 = m.apply(p, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))
    s1 = m.apply(p, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    s2 = m.apply(p, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_attention_dispatch_policy(monkeypatch, key):
    """Small grids must NEVER lower to the Pallas kernel (the packed layout's
    128-lane q-tile minimum wastes 2-16x compute on Lq=8/60 grids — measured
    honestly on TPU, BASELINE.md); big grids must use it. Verified by tracing
    with the kernel force-enabled and inspecting the jaxpr."""
    import vaesne_tpu.ops.dispatch as dispatch
    from vaesne_tpu.nn.layers import MultiHeadAttention

    def jaxpr_for(lq, lk, dropout, deterministic):
        mha = MultiHeadAttention(num_heads=4, dropout=dropout)
        q = jnp.zeros((2, lq, 32))
        kv = jnp.zeros((2, lk, 32))
        # init EXECUTES the forward: run it with the kernel off (CPU), then
        # force-enable the kernel for the abstract trace below
        monkeypatch.setenv("VAESNE_PALLAS", "0")
        variables = mha.init(
            {"params": key, "dropout": key}, q, kv, kv,
            deterministic=True,
        )
        monkeypatch.setenv("VAESNE_PALLAS", "1")
        assert dispatch.use_pallas()
        return str(jax.make_jaxpr(
            lambda v, q, kv: mha.apply(
                v, q, kv, kv, deterministic=deterministic,
                rngs={"dropout": key},
            )
        )(variables, q, kv))

    # bottleneck-encoder shape (8 queries) with dropout active: XLA path
    assert "pallas_call" not in jaxpr_for(8, 983, 0.1, False)
    # light-curve decoder (60x60) with dropout active: XLA path
    assert "pallas_call" not in jaxpr_for(60, 60, 0.1, False)
    # spectra decoder self-attention (982x982): fused kernel
    assert "pallas_call" in jaxpr_for(982, 982, 0.1, False)
    assert "pallas_call" in jaxpr_for(982, 982, 0.0, True)
