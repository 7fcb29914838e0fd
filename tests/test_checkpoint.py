"""Checkpoint/resume tests: full-state roundtrip, config JSON, name format.

The reference has NO resume path (whole-module pickles, no optimizer state —
SURVEY §5.4); these pin the strictly-stronger behavior we ship instead.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaesne_tpu import objectives
from vaesne_tpu.models import PhotometricVAE
from vaesne_tpu.training import TrainState, adamw, init_model, make_train_step
from vaesne_tpu.utils.checkpoint import (
    checkpoint_name,
    load_config,
    restore_checkpoint,
    save_checkpoint,
)

from conftest import make_photometry_batch

SMALL = dict(latent_len=2, latent_dim=2, model_dim=16, num_heads=2, ff_dim=16,
             num_layers=1, dropout=0.0)


def test_checkpoint_name_format():
    name = checkpoint_name("goldstein", "photospec", 4, 4, 1e-4, 200, K=2,
                           beta=1.0, model_dim=32)
    assert name == "goldstein_photospec_4-4_0.0001_200_K2_beta1.0_modeldim32"


@pytest.mark.slow
def test_state_roundtrip(tmp_path, rng, key):
    batch = make_photometry_batch(rng, B=8)
    model = PhotometricVAE(num_bands=6, **SMALL)
    params = init_model(model, batch, key)
    opt = adamw(1e-3)
    state = TrainState.create(params, opt, key)

    def loss_fn(m, variables, b, k):
        return objectives.elbo(m, variables, b, K=1, key=k, deterministic=True)

    step = make_train_step(model, opt, loss_fn)
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    path = os.path.join(tmp_path, "ck")
    save_checkpoint(path, state, {"lr": 1e-3, "note": "two steps"})
    restored = restore_checkpoint(path, state)

    assert int(restored.step) == int(state.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (the reference loses this entirely)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_config(path) == {"lr": 1e-3, "note": "two steps"}


@pytest.mark.slow
def test_resume_training_continues(tmp_path, rng, key):
    """Training resumed from a checkpoint is bit-identical to uninterrupted
    training (params, opt state, and RNG all round-trip)."""
    batch = make_photometry_batch(rng, B=8)
    model = PhotometricVAE(num_bands=6, **SMALL)
    params = init_model(model, batch, key)
    opt = adamw(1e-3)

    def loss_fn(m, variables, b, k):
        return objectives.elbo(m, variables, b, K=1, key=k, deterministic=True)

    step = make_train_step(model, opt, loss_fn)

    # copy params BEFORE stepping: the step donates its input buffers
    params2 = jax.tree_util.tree_map(jnp.array, params)

    # uninterrupted: 4 steps
    s = TrainState.create(params, opt, jax.random.PRNGKey(3))
    for _ in range(4):
        s, loss_straight = step(s, batch)

    # interrupted: 2 steps, checkpoint, restore, 2 more
    t = TrainState.create(params2, opt, jax.random.PRNGKey(3))
    for _ in range(2):
        t, _ = step(t, batch)
    path = os.path.join(tmp_path, "ck")
    save_checkpoint(path, t, None)
    t2 = restore_checkpoint(path, t)
    for _ in range(2):
        t2, loss_resumed = step(t2, batch)

    np.testing.assert_allclose(float(loss_straight), float(loss_resumed),
                               rtol=1e-6)
    assert int(t2.step) == int(s.step) == 4
