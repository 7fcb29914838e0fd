"""Driver-level data-parallel tests (VERDICT r3 #1).

The production CLI path (``train_loop`` via the ``train_*`` drivers) must
train data-parallel over the resolved mesh with losses matching the forced
single-device run, and the compiled scan-epoch program must contain no
batch all-gather (each chip computes its batch shard locally; the only
collective is the gradient all-reduce GSPMD inserts).
"""

import os

import jax
import numpy as np
import pytest

from vaesne_tpu.parallel import DATA_AXIS, MODEL_AXIS, resolve_mesh

TINY = [
    "model.latent_len=2", "model.num_layers=1", "model.model_dim=16",
    "model.num_heads=2", "model.ff_dim=16",
    "train.epochs=2", "train.batch_size=8", "train.K=1",
    "train.save_every=5",
]


def test_resolve_mesh_specs():
    n = jax.device_count()
    assert n >= 8
    assert resolve_mesh("none") is None
    assert resolve_mesh("1") is None
    assert resolve_mesh("off") is None
    m = resolve_mesh("auto")
    assert m is not None and m.shape[DATA_AXIS] == n
    # gcd degrade: batch 6 on 8 devices -> 2-chip DP, batch 5 -> None —
    # but LOUDLY (VERDICT r4 #7: silent under-use of the machine)
    with pytest.warns(RuntimeWarning, match="does not divide"):
        assert resolve_mesh("auto", batch_size=6).shape[DATA_AXIS] == 2
    with pytest.warns(RuntimeWarning, match="does not divide"):
        assert resolve_mesh("auto", batch_size=5) is None
    import warnings

    with warnings.catch_warnings():  # the even case stays silent
        warnings.simplefilter("error")
        assert resolve_mesh("auto", batch_size=16).shape[DATA_AXIS] == n
    m4 = resolve_mesh("4")
    assert m4.shape == {"data": 4, "model": 1}
    m42 = resolve_mesh("4x2")
    assert m42.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="devices"):
        resolve_mesh(str(n * 2))


def _train(npz, tmp_path, mesh_spec, tag):
    from vaesne_tpu.experiments.train_photometry import main

    state, losses = main([
        f"data={npz}", *TINY,
        f"train.mesh={mesh_spec}",
        f"train.ckpt_dir={tmp_path}/{tag}", f"train.log_dir={tmp_path}/{tag}",
    ])
    return state, losses


def test_cli_trains_dp_loss_matches_single_device(tmp_path):
    """train_photometry CLI with mesh=auto (8 virtual chips) vs mesh=none:
    identical permutations + RNG chain, so the loss curves must agree to
    float reduction-order noise, and the trained models must agree in
    FUNCTION space (per-parameter comparison is meaningless at this scale:
    AdamW's g/(sqrt(v)+eps) normalization amplifies 1e-7 gradient roundoff
    to O(update) on near-zero-gradient leaves; the single-STEP parameter
    parity is pinned tightly in test_sharding.py)."""
    from vaesne_tpu import objectives
    from vaesne_tpu.data import make_goldstein_like, photometry_tuple
    from vaesne_tpu.experiments.train_photometry import build_model
    from vaesne_tpu.utils.config import PhotometryVAEConfig, parse_overrides

    data = make_goldstein_like(n=32, seed=0, spectrum_bins=48,
                               photometry_length=16)
    npz = os.path.join(tmp_path, "g.npz")
    np.savez(npz, **data)

    state_1, losses_1 = _train(npz, tmp_path, "none", "single")
    state_dp, losses_dp = _train(npz, tmp_path, "auto", "dp")

    np.testing.assert_allclose(losses_1, losses_dp, rtol=2e-4)

    cfg = parse_overrides(PhotometryVAEConfig(),
                          [a for a in TINY if a.startswith("model.")])
    model = build_model(cfg)
    batch = photometry_tuple(data, idx=np.arange(8))
    key = jax.random.PRNGKey(3)
    v1 = float(objectives.elbo(model, {"params": state_1.params}, batch,
                               K=1, key=key, deterministic=True))
    v2 = float(objectives.elbo(model, {"params": jax.device_get(
        state_dp.params)}, batch, K=1, key=key, deterministic=True))
    np.testing.assert_allclose(v1, v2, rtol=1e-3)


def test_cli_dp_batch_not_divisible_errors(tmp_path):
    """An EXPLICIT mesh spec that cannot shard the batch is a loud error."""
    from vaesne_tpu.data import make_goldstein_like
    from vaesne_tpu.experiments.train_photometry import main

    data = make_goldstein_like(n=16, seed=0, spectrum_bins=48,
                               photometry_length=16)
    npz = os.path.join(tmp_path, "g.npz")
    np.savez(npz, **data)
    with pytest.raises(ValueError, match="not divisible"):
        main([f"data={npz}", *TINY, "train.batch_size=6", "train.mesh=4",
              f"train.ckpt_dir={tmp_path}", f"train.log_dir={tmp_path}"])


def test_scan_epoch_dp_compiles_without_all_gather(key):
    """The compiled DP scan-epoch program must shard each step's batch over
    ``data`` without gathering it back (the driver-level analog of the
    kernel-level assertion in test_sharding.py)."""
    from vaesne_tpu import objectives
    from vaesne_tpu.models import PhotometricVAE
    from vaesne_tpu.parallel import replicate_state, replicated
    from vaesne_tpu.training import (
        TrainState,
        adamw,
        init_model,
        make_scan_epoch,
    )

    mesh = resolve_mesh("auto")
    B, n = 16, 64
    rng = np.random.default_rng(0)
    data = (
        np.asarray(rng.normal(size=(n, 12)), np.float32),
        np.asarray(np.sort(rng.uniform(-1, 1, (n, 12)), axis=1), np.float32),
        np.asarray(rng.integers(0, 6, (n, 12)), np.int32),
        rng.uniform(size=(n, 12)) < 0.2,
    )
    model = PhotometricVAE(num_bands=6, latent_len=2, latent_dim=2,
                           model_dim=16, ff_dim=16, num_layers=1, num_heads=2)
    params = init_model(model, tuple(a[:2] for a in data), key, K=1)
    opt = adamw(1e-4)
    # distinct key buffers: state.rng is DONATED by the epoch program, so
    # passing the same array as shuffle_key would alias a donated buffer
    state = replicate_state(
        TrainState.create(params, opt, jax.random.fold_in(key, 1)), mesh)
    data = jax.device_put(data, replicated(mesh))

    def loss_fn(m, variables, b, k):
        return objectives.elbo(m, variables, b, K=1, key=k,
                               deterministic=True)

    epoch = make_scan_epoch(model, opt, loss_fn, mesh=mesh)
    # compile-only for the HLO inspection (executing the hand-compiled
    # object with a host-placed key can wedge the CPU collective runtime;
    # execution goes through the normal jit path below)
    txt = epoch.epoch_fn.lower(state, data, key, batch_size=B).compile().as_text()
    assert "all-gather" not in txt, (
        "DP scan-epoch gathers the batch; sharding constraint regressed")
    assert "all-reduce" in txt, "expected a gradient all-reduce over the mesh"
    new_state, mean_loss = epoch(state, data, key, B)
    assert np.isfinite(float(mean_loss))
    assert int(new_state.step) == n // B
