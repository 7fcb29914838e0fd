"""Unit tests for the pure-functional distribution module."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaesne_tpu.distributions import (
    Laplace,
    Normal,
    get_mean,
    kl_divergence,
    log_mean_exp,
)


def test_laplace_log_prob_matches_scipy():
    from scipy import stats

    loc, scale = 0.3, 1.7
    d = Laplace(jnp.asarray(loc), jnp.asarray(scale))
    xs = np.linspace(-5, 5, 11)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(xs))),
        stats.laplace(loc, scale).logpdf(xs),
        rtol=1e-4,
    )


def test_normal_log_prob_matches_scipy():
    from scipy import stats

    loc, scale = -0.5, 0.8
    d = Normal(jnp.asarray(loc), jnp.asarray(scale))
    xs = np.linspace(-4, 4, 11)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(xs))),
        stats.norm(loc, scale).logpdf(xs),
        rtol=1e-4,
    )


def test_laplace_sampling_moments(key):
    d = Laplace(jnp.asarray(1.5), jnp.asarray(0.5))
    s = d.sample(key, (200_000,))
    assert abs(float(s.mean()) - 1.5) < 0.01
    # Var(Laplace) = 2 b^2 = 0.5
    assert abs(float(s.var()) - 0.5) < 0.02


def test_laplace_sample_reparameterized_gradient(key):
    # d/dloc E[z] = 1, d/dscale E[|z - loc|] = 1 — check grads flow
    def f(loc, scale):
        d = Laplace(loc, scale)
        return d.sample(key, (10_000,)).mean()

    g = jax.grad(f)(jnp.asarray(0.0), jnp.asarray(1.0))
    assert abs(float(g) - 1.0) < 1e-5


def test_kl_laplace_closed_form_vs_mc(key):
    d1 = Laplace(jnp.asarray(0.7), jnp.asarray(1.3))
    d2 = Laplace(jnp.asarray(-0.2), jnp.asarray(0.9))
    closed = kl_divergence(d1, d2)
    mc = kl_divergence(d1, d2, key=None) * 0 + (
        d1.log_prob(s := d1.sample(key, (400_000,))) - d2.log_prob(s)
    ).mean()
    assert abs(float(closed) - float(mc)) < 0.01


def test_kl_laplace_same_is_zero():
    d = Laplace(jnp.asarray([0.0, 1.0]), jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(kl_divergence(d, d)), 0.0, atol=1e-7)


def test_kl_normal_closed_form():
    d1 = Normal(jnp.asarray(0.0), jnp.asarray(1.0))
    d2 = Normal(jnp.asarray(1.0), jnp.asarray(2.0))
    # KL(N(0,1)||N(1,4)) = 0.5*(1/4 + 1/4 - 1 + ln 4)
    expected = 0.5 * (0.25 + 0.25 - 1 + math.log(4.0))
    np.testing.assert_allclose(float(kl_divergence(d1, d2)), expected, rtol=1e-6)


def test_log_mean_exp():
    x = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])
    expected = np.log(np.mean(np.exp(np.asarray(x)), axis=0))
    np.testing.assert_allclose(np.asarray(log_mean_exp(x, axis=0)), expected, rtol=1e-5)


def test_get_mean():
    d = Laplace(jnp.asarray([1.0, 2.0]), jnp.asarray([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(get_mean(d)), [1.0, 2.0])


def test_distribution_is_pytree():
    d = Laplace(jnp.zeros(3), jnp.ones(3))
    leaves = jax.tree_util.tree_leaves(d)
    assert len(leaves) == 2
    d2 = jax.tree_util.tree_map(lambda a: a * 2, d)
    assert isinstance(d2, Laplace)
    np.testing.assert_allclose(np.asarray(d2.scale), 2.0)


def test_distribution_under_jit_and_vmap(key):
    @jax.jit
    def f(loc):
        d = Laplace(loc, jnp.ones_like(loc))
        return d.log_prob(jnp.zeros_like(loc))

    out = jax.vmap(f)(jnp.arange(6.0).reshape(2, 3))
    assert out.shape == (2, 3)


def test_laplace_sample_never_infinite():
    """Regression: rsample's open bound must use finfo.eps (torch's choice).
    With finfo.tiny, (tiny - 1) rounds to exactly -1.0 in float32, u == -1
    becomes reachable, and log1p(-1) = -inf poisons training (observed at
    epoch 91 of the flagship config before the fix)."""
    import jax

    d = Laplace(jnp.zeros(8), jnp.ones(8))
    worst = 0.0
    for i in range(50):
        z = d.sample(jax.random.PRNGKey(i), (8192,))
        assert bool(jnp.all(jnp.isfinite(z)))
        worst = max(worst, float(jnp.abs(z).max()))
    # the sampler's |z| is mathematically bounded by |log1p(-(1-eps))| ~ 15.95
    assert worst <= 16.0
