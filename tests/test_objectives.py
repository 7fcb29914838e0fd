"""Objective-function tests: reductions, conventions, analytic values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vaesne_tpu.distributions import log_mean_exp
from vaesne_tpu.models import MMVAE, PhotoSpecMMVAE, PhotometricVAE, SpectraVAE
from vaesne_tpu.objectives import elbo, m_elbo, m_iwae, mse, neg_info_nce

SMALL = dict(latent_len=4, latent_dim=4, model_dim=16, num_heads=2, ff_dim=16,
             num_layers=2)


def _photo(key, batch):
    m = PhotometricVAE(num_bands=6, **SMALL)
    v = m.init({"params": key, "sample": key}, batch, 1)
    return m, v


def _mm(key, batch):
    photo = PhotometricVAE(num_bands=6, **SMALL)
    spec = SpectraVAE(**SMALL)
    mm = PhotoSpecMMVAE(vaes=[photo, spec], beta=1.0)
    v = mm.init({"params": key, "sample": key}, batch, 1)
    return mm, v


def test_elbo_scalar_and_finite(key, photometry_batch):
    m, v = _photo(key, photometry_batch)
    val = elbo(m, v, photometry_batch, K=3, key=key, deterministic=True)
    assert val.shape == ()
    assert bool(jnp.isfinite(val))


def test_elbo_jit_and_grad(key, photometry_batch):
    m, v = _photo(key, photometry_batch)

    @jax.jit
    def loss(params):
        return -elbo(m, {"params": params}, photometry_batch, K=2, key=key,
                     deterministic=True)

    g = jax.grad(loss)(v["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


def test_elbo_masked_flux_values_do_not_matter(key, photometry_batch):
    """A masked point is excluded from attention and enters the likelihood
    with scale 1+1e8 — its flux value must be irrelevant to the objective."""
    m, v = _photo(key, photometry_batch)
    flux, time, band, mask = photometry_batch
    val1 = elbo(m, v, photometry_batch, K=1, key=key, deterministic=True)
    flux2 = jnp.where(mask, flux + 37.0, flux)
    val2 = elbo(m, v, (flux2, time, band, mask), K=1, key=key, deterministic=True)
    assert abs(float(val1) - float(val2)) < 1e-2


def test_m_iwae_matches_manual_single_modality(key, photometry_batch):
    """With one modality, m_iwae is the standard IWAE; recompute it
    independently from the model outputs."""
    photo = PhotometricVAE(num_bands=6, **SMALL)
    mm = MMVAE(vaes=[photo])
    x = (photometry_batch,)
    v = mm.init({"params": key, "sample": key}, x, 1)
    K = 4
    val = m_iwae(mm, v, x, K=K, key=key, deterministic=True)

    k_sample, _ = jax.random.split(key)
    qz_xs, px_zs, zss = mm.apply(v, x, K, True, rngs={"sample": k_sample})
    lpz = mm.pz().log_prob(zss[0]).sum((-1, -2))
    lqz = qz_xs[0].log_prob(zss[0]).sum((-1, -2))
    lpx = px_zs[0][0].log_prob(x[0][0][None])
    lpx = lpx.reshape(K, -1, lpx.shape[-1]).sum(-1) * mm.llik_scalings[0]
    expected = log_mean_exp(lpz + lpx - lqz, axis=0).sum()
    np.testing.assert_allclose(float(val), float(expected), rtol=1e-5)


@pytest.mark.slow
def test_m_iwae_multimodal_runs_and_grads(key, multimodal_batch):
    mm, v = _mm(key, multimodal_batch)
    val = m_iwae(mm, v, multimodal_batch, K=2, key=key, deterministic=True)
    assert bool(jnp.isfinite(val))

    g = jax.grad(
        lambda p: -m_iwae(mm, {"params": p}, multimodal_batch, K=2, key=key,
                          deterministic=True)
    )(v["params"])
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(g))


def test_m_elbo_runs(key, multimodal_batch):
    mm, v = _mm(key, multimodal_batch)
    val = m_elbo(mm, v, multimodal_batch, K=1, key=key, deterministic=True)
    assert bool(jnp.isfinite(val))


@pytest.mark.slow
def test_m_iwae_more_samples_tightens_bound(key, multimodal_batch):
    """IWAE bound is monotone in K in expectation; with shared seeds the
    averaged estimate over many keys should not decrease for larger K."""
    mm, v = _mm(key, multimodal_batch)
    keys = jax.random.split(key, 8)
    v1 = np.mean([float(m_iwae(mm, v, multimodal_batch, K=1, key=k,
                               deterministic=True)) for k in keys])
    v8 = np.mean([float(m_iwae(mm, v, multimodal_batch, K=8, key=k,
                               deterministic=True)) for k in keys])
    assert v8 >= v1 - 1.0  # allow MC slack


class _IdTowers(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return x[0], x[1]


def test_neg_info_nce_analytic():
    z = jnp.eye(3, 4)  # orthonormal rows → perfectly aligned pairs
    model = _IdTowers()
    val = neg_info_nce(model, {}, (z, z), temperature=0.1, deterministic=True)
    # logits = I/τ; CE = -log softmax diag = log(sum exp(1/τ e_i)) - 1/τ
    logits = np.eye(3) / 0.1
    p = np.exp(logits)
    ce = np.mean(np.log(p.sum(1)) - np.diag(logits))
    # fp32 log-sum-exp minus the diagonal cancels almost exactly here (the
    # aligned-pairs CE is ~1e-4), so allow absolute fp32 roundoff too
    np.testing.assert_allclose(float(val), -ce, rtol=1e-2, atol=1e-6)


def test_neg_info_nce_prefers_aligned():
    model = _IdTowers()
    z = jnp.asarray(np.random.default_rng(0).normal(size=(8, 16)), jnp.float32)
    aligned = neg_info_nce(model, {}, (z, z), deterministic=True)
    shuffled = neg_info_nce(model, {}, (z, jnp.roll(z, 1, axis=0)),
                            deterministic=True)
    assert float(aligned) > float(shuffled)


class _Linear(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return nn.Dense(2)(x)


def test_mse_objective(key):
    m = _Linear()
    x = jnp.ones((4, 3))
    v = m.init(key, x)
    y = m.apply(v, x)
    np.testing.assert_allclose(float(mse(m, v, x, y, deterministic=True)), 0.0,
                               atol=1e-6)
    assert float(mse(m, v, x, y + 1.0, deterministic=True)) == pytest.approx(-1.0)


# -- m_elbo value-level oracle (VERDICT r3 #6) ---------------------------
#
# The reference body is unrunnable (float-literal typo ``.sum((-1. -2))``,
# losses.py:41), so no golden oracle exists. Instead: a stub "model" whose
# forward returns hand-specified Laplace posteriors/likelihoods/latents,
# and an INDEPENDENT numpy recomputation of the intended estimator
# (losses.py:27-44 with dims (-1,-2)) to compare against.


class _StubMM:
    """apply() returns fixed (qz_xs, px_zs, zss); no network involved.

    Posterior locs and latents come from ``variables`` so gradient
    structure w.r.t. them can be probed (the detached-z requirement)."""

    def __init__(self, qz_scales, px_locs, scalings):
        from vaesne_tpu.distributions import Laplace

        self._Laplace = Laplace
        self._qz_scales = qz_scales
        self._px_locs = px_locs
        self.llik_scalings = scalings

    def apply(self, variables, x, K, deterministic, rngs=None):
        L = self._Laplace
        qz_xs = [L(loc, s) for loc, s in zip(variables["q_locs"],
                                             self._qz_scales)]
        M = len(qz_xs)
        px_zs = [[L(self._px_locs[e][d], jnp.float32(1.0)) for d in range(M)]
                 for e in range(M)]
        zss = list(variables["zss"])
        return qz_xs, px_zs, zss

    def pz(self):
        return self._Laplace(jnp.zeros((2, 1), jnp.float32),
                             jnp.ones((2, 1), jnp.float32))


def _np_laplace_lp(x, loc, scale):
    return -np.abs(x - loc) / scale - np.log(2.0 * scale)


def _np_kl_laplace(m1, b1, m2, b2):
    d = np.abs(m1 - m2)
    return np.log(b2 / b1) + d / b2 + (b1 / b2) * np.exp(-d / b1) - 1.0


def _stub_case():
    M, K, B, L, D = 2, 1, 2, 2, 1
    N = (3, 4)  # per-modality grid lengths
    rng = np.random.default_rng(7)
    q_locs = rng.uniform(-0.5, 0.5, (M, B, L, D)).astype(np.float32)
    qz_scales = rng.uniform(0.5, 1.5, (M, B, L, D)).astype(np.float32)
    zss = rng.uniform(-1, 1, (M, K, B, L, D)).astype(np.float32)
    px_locs = [[rng.normal(size=(K, B, N[d])).astype(np.float32)
                for d in range(M)] for e in range(M)]
    x = tuple((rng.normal(size=(B, N[d])).astype(np.float32),)
              for d in range(M))
    scalings = (0.7, 1.3)
    model = _StubMM([jnp.asarray(s) for s in qz_scales],
                    [[jnp.asarray(a) for a in row] for row in px_locs],
                    scalings)
    variables = {"q_locs": jnp.asarray(q_locs), "zss": jnp.asarray(zss)}
    return (model, variables, x, scalings, q_locs, qz_scales, zss, px_locs,
            (M, K, B))


def test_m_elbo_matches_numpy_oracle(key):
    (model, variables, x, scalings, q_locs, qz_scales, zss, px_locs,
     (M, K, B)) = _stub_case()
    val = m_elbo(model, variables, x, K=K, key=key, deterministic=True)

    # independent numpy recomputation of losses.py:27-44 (intended dims)
    lpx_terms = np.zeros((0, K, B))
    klds = []
    for r in range(M):
        klds.append(_np_kl_laplace(q_locs[r], qz_scales[r], 0.0, 1.0)
                    .sum((-1, -2)))  # [B]
        for d in range(M):
            lp = (_np_laplace_lp(x[d][0][None], px_locs[d][d], 1.0)
                  .sum(-1) * scalings[d])  # [K, B]
            if d == r:
                w = np.ones((K, B))
            else:
                z = zss[d]
                lwt = (_np_laplace_lp(z, q_locs[r][None], qz_scales[r][None])
                       - _np_laplace_lp(z, q_locs[d][None],
                                        qz_scales[d][None])).sum((-1, -2))
                w = np.exp(lwt)
            lpx_terms = np.concatenate([lpx_terms, (w * lp)[None]])
    obj = (1.0 / M) * (lpx_terms.sum(0) - np.stack(klds).sum(0)[None])
    expected = obj.mean(0).sum()
    np.testing.assert_allclose(float(val), float(expected), rtol=1e-5)


def test_m_elbo_detaches_cross_modal_latents(key):
    """The importance weights use z.detach() (losses.py:40): the latents
    must carry NO gradient, while the posterior locs must."""
    model, variables, x, *_ = _stub_case()

    g = jax.grad(
        lambda v: m_elbo(model, v, x, K=1, key=key, deterministic=True)
    )(variables)
    np.testing.assert_array_equal(np.asarray(g["zss"]), 0.0)
    assert float(jnp.abs(g["q_locs"]).max()) > 0
