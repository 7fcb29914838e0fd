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


@pytest.mark.slow
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


@pytest.mark.slow
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
    # dummy params: pytree-ness doesn't need a real model init (14 s of jit)
    params = {"dense": {"kernel": jnp.ones((3, 2)), "bias": jnp.zeros(2)}}
    state = TrainState.create(params, adamw(1e-3), key)
    leaves = jax.tree_util.tree_leaves(state)
    assert len(leaves) > 0
    mapped = jax.tree_util.tree_map(lambda a: a, state)
    assert isinstance(mapped, TrainState)


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# gradient accumulation (trainer-level replacement for the reference's
# compute_microbatch_split, losses.py:68-76)
# ---------------------------------------------------------------------------


def _encode_loss(reduction):
    """A sampling-free loss (posterior-mean encode) so accumulation can be
    compared against the whole batch EXACTLY — no per-microbatch RNG."""

    def loss_fn(m, variables, batch, k):
        mu = m.apply(variables, batch, True, method="encode")
        per_sample = jnp.sum(mu**2, axis=(-1, -2))
        return -(per_sample.mean() if reduction == "mean" else per_sample.sum())

    return loss_fn


@pytest.mark.slow
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_accum_matches_whole_batch(key, reduction):
    """accum_steps=4 must reproduce the whole-batch loss and grads (to fp32
    reduction-order noise) when the objective's batch reduction matches.
    Grads — not post-update params — are compared: AdamW's first update is
    ~lr·sign(g), which amplifies fp noise in near-zero grads to O(lr)."""
    from vaesne_tpu.training import accumulate_gradients

    data = _tiny_photo_data(n=16)
    model = PhotometricVAE(num_bands=2, **SMALL)
    params = init_model(model, data, key, K=1)
    loss_fn = _encode_loss(reduction)

    def neg_loss(p, b, k):
        return -loss_fn(model, {"params": p}, b, k)

    l_whole, g_whole = jax.value_and_grad(neg_loss)(params, data, key)
    l_accum, g_accum = accumulate_gradients(neg_loss, params, data, key, 4,
                                            reduction)
    np.testing.assert_allclose(float(l_whole), float(l_accum), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=5e-6),
        g_whole, g_accum,
    )

    # the accumulated step itself runs and advances state
    opt = adamw(1e-3)
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.array, params), opt, jax.random.PRNGKey(3))
    step = make_train_step(model, opt, loss_fn, accum_steps=4,
                           accum_reduction=reduction)
    state, loss = step(state, data)
    assert np.isfinite(float(loss)) and int(state.step) == 1


@pytest.mark.slow
def test_accumulate_gradients_key_schedule(key, multimodal_batch):
    """With a sampling objective (m_iwae), accumulation must equal the manual
    per-microbatch loop with fold_in(key, i) keys and summed grads."""
    from vaesne_tpu.training import accumulate_gradients

    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, **SMALL), SpectraVAE(**SMALL)],
        beta=1.0,
    )
    params = init_model(model, multimodal_batch, key, K=2)

    def neg_loss(p, b, k):
        return -objectives.m_iwae(model, {"params": p}, b, K=2, key=k,
                                  deterministic=True)

    k0 = jax.random.PRNGKey(9)
    loss, grads = accumulate_gradients(neg_loss, params, multimodal_batch,
                                       k0, 2, "sum")

    # manual reference: two half-batches, fold_in keys, summed
    n = multimodal_batch[0][0].shape[0]
    half = n // 2
    man_loss, man_grads = 0.0, jax.tree_util.tree_map(jnp.zeros_like, params)
    for i in range(2):
        mb = jax.tree_util.tree_map(
            lambda a: a[i * half : (i + 1) * half], multimodal_batch)
        l, g = jax.value_and_grad(neg_loss)(params, mb,
                                            jax.random.fold_in(k0, i))
        man_loss += l
        man_grads = jax.tree_util.tree_map(jnp.add, man_grads, g)
    np.testing.assert_allclose(float(loss), float(man_loss), rtol=1e-6)
    # scanned-jit vs eager reduction order differs at fp32 noise level; a
    # WRONG key schedule would change the posterior draws and move grads at
    # O(their magnitude). Compare per-leaf relative to the leaf's scale.
    def close(a, b):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-3)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale + 1e-5

    jax.tree_util.tree_map(close, grads, man_grads)


def test_accumulate_gradients_errors(key):
    """Validation fires before any tracing — dummy params keep this free of
    a model compile (it cost 32 s of pure jit on a 1-core host)."""
    from vaesne_tpu.training import accumulate_gradients

    data = _tiny_photo_data(n=10)
    params = {"w": jnp.zeros(3)}

    def neg_loss(p, b, k):
        return jnp.zeros(())

    with pytest.raises(ValueError, match="not divisible"):
        accumulate_gradients(neg_loss, params, data, key, 3)
    with pytest.raises(ValueError, match="reduction"):
        accumulate_gradients(neg_loss, params, data, key, 2, "max")


# ---------------------------------------------------------------------------
# driver-reachable resume: kill-and-continue equals uninterrupted
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_train_loop_resume_bit_exact(tmp_path):
    """train 2 epochs → 'crash' → resume to 4 must equal an uninterrupted
    4-epoch run bit-for-bit (params AND optimizer state), including the
    per-epoch augmentation/shuffle key chain."""
    import dataclasses

    from vaesne_tpu.data import augment_photometry
    from vaesne_tpu.experiments.common import train_loop
    from vaesne_tpu.utils.config import TrainConfig

    data = _tiny_photo_data(n=16)
    model = PhotometricVAE(num_bands=2, **SMALL)

    def loss_fn(m, variables, batch, k):
        return objectives.elbo(m, variables, batch, K=1, key=k,
                               deterministic=True)

    def cfg(epochs, subdir, resume=False):
        return TrainConfig(
            lr=1e-3, epochs=epochs, batch_size=8, save_every=2, K=1,
            ckpt_dir=str(tmp_path / subdir / "ckpt"),
            log_dir=str(tmp_path / subdir / "logs"), resume=resume,
        )

    common = dict(augment_fn=augment_photometry, log=False, ckpt_name="m")

    state_full, losses_full = train_loop(
        model, data, loss_fn, cfg(4, "full"), **common)

    train_loop(model, data, loss_fn, cfg(2, "resumed"), **common)
    state_res, losses_res = train_loop(
        model, data, loss_fn, cfg(4, "resumed", resume=True), **common)

    assert int(state_res.step) == int(state_full.step) == 4 * 2
    np.testing.assert_array_equal(
        np.asarray(losses_res), np.asarray(losses_full))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        (state_full.params, state_full.opt_state, state_full.rng),
        (state_res.params, state_res.opt_state, state_res.rng),
    )


@pytest.mark.slow
def test_train_loop_parity_preset(tmp_path):
    """parity=True: no grad clipping + one-shot augmentation; the run must
    still train and checkpoint (reference-dynamics mode, VERDICT item 6)."""
    from vaesne_tpu.data import augment_photometry
    from vaesne_tpu.experiments.common import train_loop
    from vaesne_tpu.utils.config import TrainConfig

    data = _tiny_photo_data(n=16)
    model = PhotometricVAE(num_bands=2, **SMALL)

    def loss_fn(m, variables, batch, k):
        return objectives.elbo(m, variables, batch, K=1, key=k,
                               deterministic=True)

    cfg = TrainConfig(lr=1e-3, epochs=2, batch_size=8, save_every=2, K=1,
                      parity=True,
                      ckpt_dir=str(tmp_path / "ckpt"),
                      log_dir=str(tmp_path / "logs"))
    state, losses = train_loop(model, data, loss_fn, cfg,
                               augment_fn=augment_photometry, log=False,
                               ckpt_name="p")
    assert np.all(np.isfinite(losses))
    assert (tmp_path / "ckpt" / "p" / "losses.npy").exists()


def test_init_model_jit_matches_eager(key):
    """init_model runs flax init under ONE jax.jit (tunnel compile
    economics, PERFORMANCE.md); the jitted program must produce
    bit-identical parameters to the eager path it replaced."""
    model = PhotometricVAE(num_bands=2, **SMALL)
    x = _tiny_photo_data(n=4, L=8)
    jitted = init_model(model, x, key, K=2)
    k_param, k_sample = jax.random.split(key)
    eager = model.init({"params": k_param, "sample": k_sample}, x, 2)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jitted, eager)
