"""Tests for the auxiliary API-surface blocks (reference util_layers.py's
unexercised utilities, SURVEY C10): shapes, gradients, straight-through
semantics, and golden parity for the relative-position attention against the
PyTorch reference implementation (which is runnable although unused)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaesne_tpu.nn import (
    GumbelSoftmax,
    LearnableFourierEncoding,
    RelativeMultiHeadAttention,
    RelativePosition,
    TransformerModel,
    flatten,
    reshape,
)


def test_flatten_reshape_roundtrip():
    x = jnp.arange(24.0).reshape(2, 3, 4)
    flat = flatten(x)
    assert flat.shape == (2, 12)
    np.testing.assert_allclose(reshape(flat, (3, 4)), x)


def test_learnable_fourier_encoding_shape_and_grad():
    m = LearnableFourierEncoding(dim=8)
    x = jnp.linspace(-1, 1, 10)[None].repeat(3, 0)  # [B, L]
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (3, 10, 8)
    g = jax.grad(lambda p: m.apply(p, x).sum())(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(l).all() for l in leaves)
    assert any(np.abs(l).max() > 0 for l in leaves)


def test_relative_position_table_lookup():
    m = RelativePosition(num_units=4, max_relative_position=2)
    params = m.init(jax.random.PRNGKey(0), 5, 5)
    emb = m.apply(params, 5, 5)
    table = params["params"]["embeddings_table"]
    assert emb.shape == (5, 5, 4)
    # diagonal → distance 0 → table[max_rel]
    np.testing.assert_allclose(emb[2, 2], table[2])
    # clipping: distance +4 clips to +2 → table[4]
    np.testing.assert_allclose(emb[0, 4], table[4])
    np.testing.assert_allclose(emb[4, 0], table[0])


class TestGumbelSoftmax:
    def setup_method(self):
        self.m = GumbelSoftmax(c_dim=5)
        self.x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 7)),
                             jnp.float32)
        self.params = self.m.init(
            {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
            self.x,
        )

    def _apply(self, params, temperature=1.0, hard=False):
        return self.m.apply(params, self.x, temperature, hard,
                            rngs={"gumbel": jax.random.PRNGKey(7)})

    def test_soft_sample_is_simplex(self):
        logits, probs, y = self._apply(self.params)
        assert logits.shape == probs.shape == y.shape == (4, 5)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(y.sum(-1), 1.0, rtol=1e-5)
        assert (y > 0).all()

    def test_hard_sample_is_one_hot_at_soft_argmax(self):
        _, _, y_soft = self._apply(self.params)
        _, _, y_hard = self._apply(self.params, hard=True)
        np.testing.assert_allclose(np.sort(y_hard, -1)[:, :-1], 0.0, atol=1e-6)
        np.testing.assert_allclose(y_hard.max(-1), 1.0, rtol=1e-6)
        np.testing.assert_array_equal(y_hard.argmax(-1), y_soft.argmax(-1))

    def test_straight_through_gradient_matches_soft(self):
        # d(hard)/d(params) == d(soft)/d(params): the ST estimator routes
        # the one-hot's gradient through the soft sample (util_layers.py:381)
        w = jnp.asarray(np.random.default_rng(1).normal(size=(4, 5)), jnp.float32)

        def loss(params, hard):
            *_, y = self._apply(params, hard=hard)
            return (y * w).sum()

        g_soft = jax.grad(loss)(self.params, False)
        g_hard = jax.grad(loss)(self.params, True)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
            g_soft, g_hard,
        )

    def test_low_temperature_sharpens(self):
        _, _, y_hot = self._apply(self.params, temperature=0.05)
        _, _, y_warm = self._apply(self.params, temperature=5.0)
        assert y_hot.max(-1).mean() > y_warm.max(-1).mean()


@pytest.mark.slow
def test_transformer_model_shapes():
    m = TransformerModel(embed_dim=8, num_heads=2, ff_dim=16, num_layers=2,
                         dropout=0.0, selfattn=True)
    x = jnp.ones((2, 5, 8))
    ctx = jnp.ones((2, 3, 8))
    params = m.init(jax.random.PRNGKey(0), x, ctx)
    out = m.apply(params, x, ctx)
    assert out.shape == x.shape
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------------
# Golden parity: RelativeMultiHeadAttention vs the torch reference
# ---------------------------------------------------------------------------

torch = pytest.importorskip("torch")
REF = "/root/reference/package"
if REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def torch_relative_attn():
    try:
        from VAESNe.util_layers import MultiHeadAttentionLayer_relative
    except Exception:
        pytest.skip("reference package unavailable")
    torch.manual_seed(0)
    return MultiHeadAttentionLayer_relative(
        hid_dim=16, n_heads=4, dropout=0.0, device="cpu"
    ).eval()


def _import_relative_weights(t_model):
    sd = {k: np.asarray(v.detach()) for k, v in t_model.state_dict().items()}

    def linear(p):
        return {"kernel": sd[f"{p}.weight"].T, "bias": sd[f"{p}.bias"]}

    return {
        "fc_q": linear("fc_q"),
        "fc_k": linear("fc_k"),
        "fc_v": linear("fc_v"),
        "fc_o": linear("fc_o"),
        "relative_position_k": {
            "embeddings_table": sd["relative_position_k.embeddings_table"]
        },
        "relative_position_v": {
            "embeddings_table": sd["relative_position_v.embeddings_table"]
        },
    }


@pytest.mark.parametrize("with_mask", [False, True])
def test_relative_attention_golden_parity(torch_relative_attn, with_mask):
    rng = np.random.default_rng(2)
    B, LQ, LK, E = 3, 7, 9, 16
    q = rng.normal(size=(B, LQ, E)).astype(np.float32)
    kv = rng.normal(size=(B, LK, E)).astype(np.float32)
    mask = None
    t_mask = None
    if with_mask:
        keep = rng.uniform(size=(B, 1, 1, LK)) > 0.3
        keep[..., 0] = True  # at least one visible key per row
        mask = jnp.asarray(keep)
        t_mask = torch.from_numpy(keep)

    with torch.no_grad():
        expected = torch_relative_attn(
            torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv),
            mask=t_mask,
        ).numpy()

    j_model = RelativeMultiHeadAttention(num_heads=4, dropout=0.0,
                                         max_relative_position=2)
    params = {"params": _import_relative_weights(torch_relative_attn)}
    got = j_model.apply(params, jnp.asarray(q), jnp.asarray(kv),
                        jnp.asarray(kv), mask=mask)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
