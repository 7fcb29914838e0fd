"""Training loop tests: fused step, loss decrease, epoch driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaesne_tpu import objectives
from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE
from vaesne_tpu.training import (
    TrainState,
    adamw,
    epoch_batches,
    fit,
    init_model,
    make_train_step,
    train_epoch,
)

SMALL = dict(latent_len=2, latent_dim=2, model_dim=16, num_heads=2, ff_dim=16,
             num_layers=1, dropout=0.0)


def _tiny_photo_data(n=32, L=16):
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(-1, 1, (n, L)), axis=1)
    flux = np.sin(3 * t) + 0.05 * rng.standard_normal((n, L))
    return (
        jnp.asarray(flux, jnp.float32),
        jnp.asarray(t, jnp.float32),
        jnp.asarray(rng.integers(0, 2, (n, L)), jnp.int32),
        jnp.asarray(rng.uniform(size=(n, L)) < 0.1),
    )


def test_epoch_batches_shapes_and_coverage(key):
    data = (jnp.arange(10.0), jnp.arange(10.0) * 2)
    batches = list(epoch_batches(key, data, 3))
    assert len(batches) == 3  # remainder dropped for static shapes
    for b in batches:
        assert b[0].shape == (3,)
    seen = np.concatenate([np.asarray(b[0]) for b in batches])
    assert len(np.unique(seen)) == 9  # a permutation, no repeats


def test_epoch_batches_too_large_batch(key):
    with pytest.raises(ValueError):
        list(epoch_batches(key, (jnp.arange(4.0),), 8))


def test_train_step_decreases_elbo_loss(key):
    data = _tiny_photo_data()
    model = PhotometricVAE(num_bands=2, **SMALL)
    params = init_model(model, data, key, K=1)
    opt = adamw(1e-3)
    state = TrainState.create(params, opt, jax.random.PRNGKey(1))

    def loss_fn(m, variables, batch, k):
        return objectives.elbo(m, variables, batch, K=1, key=k, deterministic=True)

    step = make_train_step(model, opt, loss_fn)
    state, losses = fit(state, step, data, batch_size=16, epochs=8,
                        key=jax.random.PRNGKey(2))
    assert int(state.step) == 8 * 2
    # average of the last epochs must improve on the first
    assert np.mean(losses[-3:]) < losses[0]
    assert all(np.isfinite(losses))


def test_train_step_mmvae_m_iwae(key, multimodal_batch):
    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, **SMALL), SpectraVAE(**SMALL)],
        beta=1.0,
    )
    params = init_model(model, multimodal_batch, key, K=2)
    opt = adamw(1e-4)
    state = TrainState.create(params, opt, jax.random.PRNGKey(1))

    def loss_fn(m, variables, batch, k):
        return objectives.m_iwae(m, variables, batch, K=2, key=k,
                                 deterministic=True)

    step = make_train_step(model, opt, loss_fn)
    # the step donates its input state's buffers — copy out anything that
    # must be compared afterwards
    rng0 = np.asarray(state.rng).copy()
    s1, l1 = step(state, multimodal_batch)
    rng1 = np.asarray(s1.rng).copy()
    s2, l2 = step(s1, multimodal_batch)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert int(s2.step) == 2
    # rng advances so posterior samples differ between steps
    assert not np.array_equal(rng1, rng0)


def test_train_state_is_pytree(key):
    data = _tiny_photo_data(n=8)
    model = PhotometricVAE(num_bands=2, **SMALL)
    params = init_model(model, data, key)
    state = TrainState.create(params, adamw(1e-3), key)
    leaves = jax.tree_util.tree_leaves(state)
    assert len(leaves) > 0
    mapped = jax.tree_util.tree_map(lambda a: a, state)
    assert isinstance(mapped, TrainState)


def test_scan_epoch_matches_loop(rng, key):
    """make_scan_epoch runs the whole epoch under one lax.scan and must
    reproduce the per-batch loop exactly: same permutation, same per-step
    RNG chain, same final params and mean loss."""
    from vaesne_tpu.models import PhotometricVAE
    from vaesne_tpu.training import make_scan_epoch, train_epoch

    from conftest import make_photometry_batch

    data = make_photometry_batch(rng, B=20)
    model = PhotometricVAE(num_bands=6, latent_len=2, latent_dim=2,
                           model_dim=16, num_heads=2, ff_dim=16,
                           num_layers=1, dropout=0.0)
    params = init_model(model, data, key, K=2)
    opt = adamw(1e-3)

    def loss_fn(m, variables, b, k):
        return objectives.elbo(m, variables, b, K=2, key=k, deterministic=True)

    shuffle = jax.random.PRNGKey(11)
    state_a = TrainState.create(
        jax.tree_util.tree_map(jnp.array, params), opt, jax.random.PRNGKey(5)
    )
    step = make_train_step(model, opt, loss_fn)
    state_a, loss_a = train_epoch(state_a, step, data, 8, shuffle)

    state_b = TrainState.create(
        jax.tree_util.tree_map(jnp.array, params), opt, jax.random.PRNGKey(5)
    )
    epoch_fn = make_scan_epoch(model, opt, loss_fn)
    state_b, loss_b = epoch_fn(state_b, data, shuffle, 8)

    assert int(state_a.step) == int(state_b.step) == 2  # 20 // 8
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6),
        state_a.params, state_b.params,
    )


def test_scan_epoch_batch_too_large_raises(rng, key):
    from vaesne_tpu.models import PhotometricVAE
    from vaesne_tpu.training import make_scan_epoch

    from conftest import make_photometry_batch

    data = make_photometry_batch(rng, B=4)
    model = PhotometricVAE(num_bands=6, latent_len=2, latent_dim=2,
                           model_dim=16, num_heads=2, ff_dim=16,
                           num_layers=1, dropout=0.0)
    params = init_model(model, data, key, K=1)
    opt = adamw(1e-3)

    def loss_fn(m, variables, b, k):
        return objectives.elbo(m, variables, b, K=1, key=k, deterministic=True)

    epoch_fn = make_scan_epoch(model, opt, loss_fn)
    state = TrainState.create(params, opt, key)
    with pytest.raises(ValueError, match="exceeds dataset size"):
        epoch_fn(state, data, key, 8)
