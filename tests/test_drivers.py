"""Driver-level tests: checkpoint config round-trip and the npz data contract.

VERDICT round 1 items 2 and 7: (a) eval/try drivers must rebuild the EXACT
architecture a checkpoint was trained with from its ``config.json`` (the
analog of the reference's ability to ``torch.load`` any pickled model,
spect_cond_LC.py:75-82), and (b) the synthetic-data and real-npz paths must
meet bit-identically at the tuple builders (test_photospectra.py:22-60
contract).
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from vaesne_tpu.utils.config import (
    CONFIG_CLASSES,
    ContrastiveConfig,
    PhotoSpectraMMVAEConfig,
    asdict,
    from_dict,
    parse_overrides,
)


def test_config_from_dict_roundtrip_all_classes():
    for name, cls in CONFIG_CLASSES.items():
        cfg = cls()
        assert from_dict(cls, asdict(cfg)) == cfg, name


def test_config_from_dict_preserves_overrides():
    cfg = parse_overrides(
        PhotoSpectraMMVAEConfig(),
        ["model.latent_len=2", "model.num_layers=1", "train.lr=0.001",
         "train.grad_clip=-1"],
    )
    back = from_dict(PhotoSpectraMMVAEConfig, asdict(cfg))
    assert back == cfg
    assert back.model.latent_len == 2
    assert back.train.grad_clip == -1.0


def test_config_from_dict_ignores_unknown_and_tag_keys():
    d = asdict(PhotoSpectraMMVAEConfig())
    d["_config_class"] = "PhotoSpectraMMVAEConfig"
    d["not_a_field"] = 42
    assert from_dict(PhotoSpectraMMVAEConfig, d) == PhotoSpectraMMVAEConfig()


def test_config_from_dict_tuples_survive_json():
    """JSON turns tuples into lists; from_dict must turn them back (frozen
    dataclasses hash their fields — RegressionConfig.mlp_hidden)."""
    import json

    from vaesne_tpu.utils.config import RegressionConfig

    d = json.loads(json.dumps(asdict(RegressionConfig())))
    cfg = from_dict(RegressionConfig, d)
    assert cfg == RegressionConfig()
    assert isinstance(cfg.mlp_hidden, tuple)


@pytest.mark.slow
def test_train_then_eval_restores_nondefault_config(tmp_path):
    """Train the flagship with a NON-default architecture through the real
    driver, then restore through the eval driver's path with no flags —
    `_config_for` must rebuild latent_len=2 / num_layers=1 from the
    checkpoint's config.json, and `_restore` must load the weights into it.
    Also exercises the real-file npz path end to end (data= -> load_npz)."""
    from vaesne_tpu.data import make_goldstein_like
    from vaesne_tpu.experiments.eval_goldstein import _config_for, _restore
    from vaesne_tpu.experiments.train_photospectra import build_model, main

    data = make_goldstein_like(n=24, seed=0, spectrum_bins=48,
                               photometry_length=16)
    npz = os.path.join(tmp_path, "goldstein.npz")
    np.savez(npz, **data)

    state, losses = main([
        f"data={npz}",
        "model.latent_len=2", "model.num_layers=1", "model.model_dim=16",
        "model.num_heads=2", "model.ff_dim=16",
        "train.epochs=1", "train.batch_size=8", "train.K=1",
        "train.save_every=1",
        f"train.ckpt_dir={tmp_path}", f"train.log_dir={tmp_path}",
    ])
    ckpt = os.path.join(tmp_path, "goldstein_photospec_2-4_K1_beta1.0")
    assert os.path.isdir(ckpt)

    # no flags: architecture comes from the checkpoint's config.json
    cfg = _config_for(ckpt, PhotoSpectraMMVAEConfig)
    assert cfg.model.latent_len == 2
    assert cfg.model.num_layers == 1
    assert cfg.model.model_dim == 16

    from vaesne_tpu.data import multimodal_tuple

    model = build_model(cfg)
    te_idx = np.asarray(data["testing_idx"])[:2]
    example = multimodal_tuple(data, idx=te_idx)
    variables = _restore(ckpt, model, example, jax.random.PRNGKey(0), K=1,
                         train_cfg=cfg.train)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # wrong driver: evaluating an MMVAE checkpoint as a contrastive net is a
    # loud error, not a silent mis-evaluation
    with pytest.raises(ValueError, match="trained as"):
        _config_for(ckpt, ContrastiveConfig)


@pytest.mark.slow
def test_latent_swap_driver(tmp_path):
    """`model=latent_swap` (try_photospectra_model.py:82-85): train tiny
    unimodal VAEs with MATCHING latent shapes through the real drivers, then
    the swap experiment must produce its figure; mismatched latent shapes
    must error loudly."""
    from vaesne_tpu.data import make_goldstein_like
    from vaesne_tpu.experiments.train_photometry import main as train_photo
    from vaesne_tpu.experiments.train_spectra import main as train_spec
    from vaesne_tpu.experiments.try_models import main as try_main

    data = make_goldstein_like(n=24, seed=0, spectrum_bins=48,
                               photometry_length=16)
    npz = os.path.join(tmp_path, "goldstein.npz")
    np.savez(npz, **data)
    small = ["model.num_layers=1", "model.model_dim=16", "model.num_heads=2",
             "model.ff_dim=16", "train.epochs=1", "train.batch_size=8",
             "train.K=1", "train.save_every=1",
             f"train.ckpt_dir={tmp_path}", f"train.log_dir={tmp_path}"]
    train_photo([f"data={npz}", "model.latent_dim=4"] + small)
    train_spec([f"data={npz}"] + small)
    photo_ckpt = os.path.join(tmp_path, "goldstein_photometry_4-4")
    spec_ckpt = os.path.join(tmp_path, "goldstein_spectra_4-4")
    assert os.path.isdir(photo_ckpt) and os.path.isdir(spec_ckpt)

    try_main(["model=latent_swap", f"data={npz}",
              f"photo_ckpt={photo_ckpt}", f"spec_ckpt={spec_ckpt}",
              "K=4", "n=2", f"out={tmp_path}"])
    assert os.path.exists(os.path.join(tmp_path, "latent_swap.png"))

    # mismatched latent shapes: loud error, not silent garbage
    train_photo([f"data={npz}", "model.latent_dim=2"] + small)
    bad = os.path.join(tmp_path, "goldstein_photometry_4-2")
    with pytest.raises(ValueError, match="matching latent shapes"):
        try_main(["model=latent_swap", f"data={npz}",
                  f"photo_ckpt={bad}", f"spec_ckpt={spec_ckpt}",
                  "K=4", "n=2", f"out={tmp_path}"])


@pytest.mark.slow
def test_try_ztf_mmvae_against_shipped_checkpoint(tmp_path):
    """The ZTF qualitative-eval path (try_ZTF_photospect.py analog) runs
    against the shipped ZTF artifact: config comes from its config.json,
    bands=2 from the data, figures land in out=."""
    pytest.importorskip("matplotlib")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(repo, "artifacts", "ckpt",
                        "ztf_photospec_4-4_K8_beta0.5")
    if not os.path.isdir(ckpt):
        pytest.skip("shipped ZTF artifact not present")
    from vaesne_tpu.experiments.try_models import main

    main([f"mm_ckpt={ckpt}", "model=ztf_mmvae", "K=3", "n=1",
          f"out={tmp_path}"])
    for f in ("ztf_lc_reconstruction.png", "ztf_spectra_reconstruction.png",
              "ztf_spectra_priorsamples.png"):
        assert os.path.exists(os.path.join(tmp_path, f)), f


@pytest.mark.slow
def test_try_ztf_spectra_against_shipped_checkpoint(tmp_path):
    pytest.importorskip("matplotlib")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(repo, "artifacts", "ckpt", "ztf_spectra_4-4")
    if not os.path.isdir(ckpt):
        pytest.skip("shipped ZTF artifact not present")
    from vaesne_tpu.experiments.try_models import main

    main([f"mm_ckpt={ckpt}", "model=ztf_spectra", "K=3", "n=1",
          f"out={tmp_path}"])
    assert os.path.exists(
        os.path.join(tmp_path, "ztf_spectra_reconstruction.png"))


def test_restore_config_missing_returns_none(tmp_path):
    from vaesne_tpu.utils.checkpoint import restore_config

    assert restore_config(str(tmp_path), PhotoSpectraMMVAEConfig) is None


def test_goldstein_npz_roundtrip(tmp_path):
    """make_goldstein_like -> real .npz file -> load_npz -> tuple builders is
    bit-identical to building tuples from the in-memory dict (the one seam
    between the synthetic and real-data paths, VERDICT item 7)."""
    from vaesne_tpu.data import (
        load_npz,
        make_goldstein_like,
        multimodal_tuple,
        spectra_tuple,
    )

    data = make_goldstein_like(n=16, seed=3, spectrum_bins=32,
                               photometry_length=12)
    npz = os.path.join(tmp_path, "g.npz")
    np.savez(npz, **data)
    loaded = load_npz(npz)

    assert set(data) == set(loaded)
    for k in data:
        np.testing.assert_array_equal(np.asarray(data[k]),
                                      np.asarray(loaded[k]))

    idx = np.asarray(data["training_idx"])
    a = multimodal_tuple(data, idx=idx)
    b = multimodal_tuple(loaded, idx=idx)
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # scalar normalization keys survive as 0-d arrays usable as floats
    assert float(loaded["flux_std"]) == float(data["flux_std"])
    # spectra mask convention: stored 1 == observed -> True == missing
    assert bool(np.any(np.asarray(spectra_tuple(loaded)[3]) ==
                       (np.asarray(loaded["mask"]) == 0)))


def test_ztf_npz_roundtrip(tmp_path):
    from vaesne_tpu.data import load_npz, make_ztf_like, multimodal_tuple

    data = make_ztf_like(n=12, seed=1, spectrum_bins=24, photometry_length=10)
    npz = os.path.join(tmp_path, "z.npz")
    np.savez(npz, **data)
    loaded = load_npz(npz)
    assert set(data) == set(loaded)
    idx = np.asarray(data["testing_idx"])
    for la, lb in zip(jax.tree_util.tree_leaves(multimodal_tuple(data, idx=idx)),
                      jax.tree_util.tree_leaves(multimodal_tuple(loaded, idx=idx))):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # ZTF is 2-band: band indices must stay in range
    assert int(np.asarray(loaded["photowavelength"]).max()) < 2


@pytest.mark.slow
def test_driver_accum_parity_resume_cli(tmp_path):
    """The round-2 TrainConfig features are reachable from a real driver CLI
    in combination: train.accum_steps=2 (scanned gradient accumulation),
    train.parity=true (reference dynamics: no clipping, one-shot
    augmentation), then train.resume=true continues the SAME run — the
    loss history extends instead of restarting and training stays finite."""
    from vaesne_tpu.data import make_goldstein_like
    from vaesne_tpu.experiments.train_photospectra import main

    data = make_goldstein_like(n=24, seed=0, spectrum_bins=48,
                               photometry_length=16)
    npz = os.path.join(tmp_path, "goldstein.npz")
    np.savez(npz, **data)

    common = [
        f"data={npz}",
        "model.latent_len=2", "model.num_layers=1", "model.model_dim=16",
        "model.num_heads=2", "model.ff_dim=16",
        "train.batch_size=8", "train.K=1", "train.save_every=1",
        "train.accum_steps=2", "train.parity=true",
        f"train.ckpt_dir={tmp_path}", f"train.log_dir={tmp_path}",
    ]
    state1, losses1 = main(common + ["train.epochs=1"])
    assert len(losses1) == 1 and np.isfinite(losses1).all()
    assert int(state1.step) == 2  # 16 train samples / batch 8 = 2 updates

    state2, losses2 = main(common + ["train.epochs=3", "train.resume=true"])
    assert len(losses2) == 3, "resume must extend the loss history, not restart"
    assert losses2[0] == losses1[0]
    assert np.isfinite(losses2).all()
    assert int(state2.step) == 6


@pytest.mark.slow
def test_driver_resume_survives_stale_or_corrupt_progress(tmp_path):
    """A crash between the orbax checkpoint save and the progress.json write
    leaves a progress record one save window behind the checkpoint's step
    counter; a kill mid-write can leave truncated JSON. Neither may brick
    resume: the epoch-aligned step counter is authoritative."""
    import json

    from vaesne_tpu.data import make_goldstein_like
    from vaesne_tpu.experiments.train_photospectra import main

    data = make_goldstein_like(n=24, seed=0, spectrum_bins=48,
                               photometry_length=16)
    npz = os.path.join(tmp_path, "goldstein.npz")
    np.savez(npz, **data)
    common = [
        f"data={npz}",
        "model.latent_len=2", "model.num_layers=1", "model.model_dim=16",
        "model.num_heads=2", "model.ff_dim=16",
        "train.batch_size=8", "train.K=1", "train.save_every=1",
        f"train.ckpt_dir={tmp_path}", f"train.log_dir={tmp_path}",
    ]
    state1, _ = main(common + ["train.epochs=2"])
    assert int(state1.step) == 4  # 16 train samples / batch 8, 2 epochs
    ckpt = next(d for d in os.listdir(tmp_path)
                if os.path.isdir(os.path.join(tmp_path, str(d), "state")))
    progress = os.path.join(tmp_path, ckpt, "progress.json")

    # stale record (crash window): checkpoint at epoch 2, record says 1
    with open(progress, "w") as f:
        json.dump({"epochs_done": 1}, f)
    state2, losses2 = main(common + ["train.epochs=3", "train.resume=true"])
    assert int(state2.step) == 6, "resume must trust the checkpoint step"
    assert len(losses2) == 3

    # corrupt record (kill mid-write): resume falls back to the step counter
    with open(progress, "w") as f:
        f.write('{"epochs_do')
    state3, _ = main(common + ["train.epochs=4", "train.resume=true"])
    assert int(state3.step) == 8

    # record AHEAD of the step-derived epoch: a stale record can only LAG
    # (checkpoint saves before the progress write), so ahead means the
    # data/batch geometry drifted while the step count happens to divide
    # the new steps_per_epoch — must error, not silently resume at the
    # mis-derived epoch
    with open(progress, "w") as f:
        json.dump({"epochs_done": 5}, f)
    with pytest.raises(ValueError, match="geometry mismatch"):
        main(common + ["train.epochs=5", "train.resume=true"])


@pytest.mark.slow
def test_bench_contract_cpu(tmp_path, capsys, monkeypatch):
    """bench.py is the driver's measurement contract: its child mode must
    print EXACTLY one JSON line with the required keys. Run in-process at a
    tiny batch on the CPU backend (the real TPU run is the driver's job)."""
    import json
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.syspath_prepend(repo)
    monkeypatch.setenv("VAESNE_BENCH_CHILD", "1")
    # bench.py setdefaults VAESNE_BF16/REMAT/COMPILE_CACHE at IMPORT time
    # (the driver contract for child subprocesses). In-process that would
    # leak bf16 compute into every later test in the same pytest run (the
    # golden-parity tolerances are fp32-only) — pin them via monkeypatch
    # first so the setdefaults are no-ops and teardown restores the world.
    monkeypatch.setenv("VAESNE_BF16", "0")
    monkeypatch.setenv("VAESNE_REMAT", "0")
    monkeypatch.setenv("VAESNE_COMPILE_CACHE", "")
    import bench

    monkeypatch.setattr(bench, "B", 2)
    monkeypatch.setattr(bench, "LP", 12)  # tiny grids: the conftest's
    monkeypatch.setattr(bench, "NS", 64)  # 8-device mesh multiplies B by 8
    monkeypatch.setattr(bench, "TIMED_STEPS", 2)
    monkeypatch.setattr(bench, "WINDOWS", 1)
    bench.main()
    out = capsys.readouterr().out
    json_lines = [l for l in out.splitlines() if l.startswith("{")]
    assert len(json_lines) == 1, out
    rec = json.loads(json_lines[0])
    for k in ("metric", "value", "unit", "vs_baseline", "precision",
              "devices"):
        assert k in rec, k
    # value is GLOBAL samples/sec; the watchdog normalizes MFU by
    # devices * per-chip peak, so the child must report the device count
    assert rec["devices"] == jax.device_count()
    assert rec["unit"] == "samples/sec" and rec["value"] > 0
    # the audited FLOPs constant must stay wired for the mfu_pct field
    assert bench.FLOPS_PER_SAMPLE and bench.FLOPS_PER_SAMPLE > 1e9


def test_bench_watchdog_fp32_fallback(tmp_path, capsys, monkeypatch):
    """When the live fp32 companion child fails (tunnel hang), the enriched
    line must fall back to the last persisted fp32 measurement and label it
    (fp32_cached_from) — never silently pass a stale reading off as live."""
    import json
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.syspath_prepend(repo)
    monkeypatch.setenv("VAESNE_BF16", "0")
    monkeypatch.setenv("VAESNE_REMAT", "0")
    monkeypatch.setenv("VAESNE_COMPILE_CACHE", "")
    import bench

    headline = {"metric": "m", "value": 100.0, "unit": "samples/sec",
                "vs_baseline": 250.0, "precision": "bf16", "devices": 1}
    calls = []

    def fake_child(extra_env, attempts=2, timeout=480):
        calls.append(extra_env)
        return dict(headline) if not extra_env else None  # fp32 leg fails

    monkeypatch.setattr(bench, "_child_json", fake_child)
    cache = os.path.join(repo, ".bench_fp32.json")
    had = os.path.exists(cache)
    prior = open(cache).read() if had else None
    try:
        with open(cache, "w") as f:
            json.dump({"value": 728.22, "measured_at": "2026-08-19 19:13"}, f)
        bench._run_with_watchdog()
    finally:
        if had:
            with open(cache, "w") as f:
                f.write(prior)
        else:
            os.remove(cache)
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    # headline first (so a driver timeout still records it), enriched second
    assert len(lines) == 2
    assert "fp32_samples_per_sec" not in lines[0]
    assert lines[1]["fp32_samples_per_sec"] == 728.22
    assert lines[1]["fp32_cached_from"] == "2026-08-19 19:13"
    assert lines[1]["mfu_pct"] > 0  # bf16 headline still gets MFU
    assert calls == [{}, {"VAESNE_BF16": "0"}]


def test_bright_variants_end_to_end(tmp_path):
    """`model.bright=true` (VERDICT r3 #4): the spectra driver must train a
    BrightSpectraVAE through the CLI, persist the flag in config.json, and
    the eval-side restore must rebuild the Bright architecture (reference
    imports: ZTF_spectonly.py:12, test_photospectra.py:12-13)."""
    from vaesne_tpu.data import make_goldstein_like
    from vaesne_tpu.experiments.eval_goldstein import _config_for
    from vaesne_tpu.experiments.train_spectra import build_model, main
    from vaesne_tpu.models import BrightSpectraVAE
    from vaesne_tpu.utils.config import SpectraVAEConfig

    data = make_goldstein_like(n=16, seed=0, spectrum_bins=48,
                               photometry_length=16)
    npz = os.path.join(tmp_path, "g.npz")
    np.savez(npz, **data)

    state, losses = main([
        f"data={npz}", "model.bright=true",
        "model.latent_len=2", "model.num_layers=1", "model.model_dim=16",
        "model.num_heads=2", "model.ff_dim=16",
        "train.epochs=1", "train.batch_size=8", "train.save_every=1",
        f"train.ckpt_dir={tmp_path}", f"train.log_dir={tmp_path}",
    ])
    assert losses and np.isfinite(losses[-1])
    # the brightness head exists in the trained params
    assert "brightnessfc" in state.params

    ckpts = [d for d in os.listdir(tmp_path)
             if os.path.isdir(os.path.join(tmp_path, d)) and "spec" in d]
    assert ckpts, f"no checkpoint dir in {os.listdir(tmp_path)}"
    cfg = _config_for(os.path.join(tmp_path, ckpts[0]), SpectraVAEConfig)
    assert cfg.model.bright is True
    assert isinstance(build_model(cfg), BrightSpectraVAE)


def test_bright_photometry_driver_smoke(tmp_path):
    from vaesne_tpu.data import make_goldstein_like
    from vaesne_tpu.experiments.train_photometry import build_model, main
    from vaesne_tpu.models import BrightPhotometricVAE
    from vaesne_tpu.utils.config import PhotometryVAEConfig, parse_overrides

    cfg = parse_overrides(PhotometryVAEConfig(), ["model.bright=true"])
    assert isinstance(build_model(cfg), BrightPhotometricVAE)

    data = make_goldstein_like(n=16, seed=0, spectrum_bins=48,
                               photometry_length=16)
    npz = os.path.join(tmp_path, "g.npz")
    np.savez(npz, **data)
    state, losses = main([
        f"data={npz}", "model.bright=true",
        "model.latent_len=2", "model.num_layers=1", "model.model_dim=16",
        "model.num_heads=2", "model.ff_dim=16",
        "train.epochs=1", "train.batch_size=8", "train.save_every=1",
        f"train.ckpt_dir={tmp_path}", f"train.log_dir={tmp_path}",
    ])
    assert losses and np.isfinite(losses[-1])


def test_real_mnist_smoke_when_available(tmp_path):
    """Runs the reference's one end-to-end sanity config (mnist.py:13-45) on
    the REAL digits whenever torchvision + a local MNIST copy exist;
    cleanly skipped otherwise (no network egress in CI). VERDICT r3 #10."""
    pytest.importorskip("torchvision")
    from vaesne_tpu.experiments.train_image import load_mnist_like, main

    try:
        load_mnist_like(n=1, require_real=True)
    except Exception:
        pytest.skip("no local MNIST copy under ./data_mnist")

    os.environ["VAESNE_REQUIRE_REAL_MNIST"] = "1"
    try:
        state, losses = main([
            "dataset=mnist",
            "model.latent_len=2", "model.num_layers=1", "model.model_dim=16",
            "model.num_heads=2", "model.ff_dim=16",
            "train.epochs=1", "train.batch_size=8", "train.save_every=1",
            f"train.ckpt_dir={tmp_path}", f"train.log_dir={tmp_path}",
        ])
    finally:
        os.environ.pop("VAESNE_REQUIRE_REAL_MNIST", None)
    assert losses and np.isfinite(losses[-1])


def test_mnist_require_real_raises_without_data(tmp_path):
    """The silent synthetic fallback must turn into a hard error under
    require_real (otherwise 'ran on MNIST' could silently mean arcs)."""
    from vaesne_tpu.experiments.train_image import load_mnist_like

    with pytest.raises(Exception):
        load_mnist_like(n=1, require_real=True,
                        root=str(tmp_path / "definitely_missing"))
    # and the fallback still works when not required
    imgs = load_mnist_like(n=2, root=str(tmp_path / "definitely_missing"))
    assert imgs.shape == (2, 1, 60, 60)


# ---------------------------------------------------------------------------
# Real-data readiness drill (VERDICT r4 #8): every npz-based train driver
# runs end-to-end through the REAL-FILE path — npz written to disk →
# load_npz → validate_npz → driver — so the only untested element left for
# a user with the real Goldstein/ZTF files is the bytes themselves.
# Documented user commands: REALDATA.md.
# ---------------------------------------------------------------------------

_DRILL_TINY = [
    "model.latent_len=2", "model.num_layers=1", "model.model_dim=16",
    "model.num_heads=2", "model.ff_dim=16",
]
_DRILL_TRAIN = [
    "train.epochs=1", "train.batch_size=8", "train.K=1",
    "train.save_every=1",
]

NPZ_TRAIN_DRIVERS = [
    ("train_photometry", "goldstein", _DRILL_TINY),
    ("train_spectra", "goldstein", _DRILL_TINY),
    ("train_photospectra", "goldstein", _DRILL_TINY),
    ("train_contrastive", "goldstein", _DRILL_TINY),
    ("train_ztf_spectra", "ztf", _DRILL_TINY),
    ("train_ztf_photospect", "ztf", _DRILL_TINY),
    ("train_regression", "goldstein",
     ["modality=photometry", "backbone=end2end"]),
]


@pytest.mark.slow
@pytest.mark.parametrize("driver,kind,extra", NPZ_TRAIN_DRIVERS,
                         ids=[d for d, _, _ in NPZ_TRAIN_DRIVERS])
def test_every_driver_trains_from_disk_npz(tmp_path, driver, kind, extra):
    import importlib

    from vaesne_tpu.data import make_goldstein_like, make_ztf_like

    maker = make_ztf_like if kind == "ztf" else make_goldstein_like
    data = maker(n=16, seed=0, spectrum_bins=48, photometry_length=12)
    npz = os.path.join(tmp_path, f"{kind}.npz")
    np.savez(npz, **data)
    mod = importlib.import_module(f"vaesne_tpu.experiments.{driver}")
    result = mod.main([
        f"data={npz}", *extra, *_DRILL_TRAIN,
        f"train.ckpt_dir={tmp_path}", f"train.log_dir={tmp_path / 'logs'}",
    ])
    if isinstance(result, tuple) and len(result) == 2:
        _, losses = result
        assert np.isfinite(np.asarray(losses, np.float64)).all()
    # every driver checkpoints through train_loop: a config.json must exist
    ckpts = [d for d in os.listdir(tmp_path)
             if os.path.isdir(os.path.join(tmp_path, d))
             and os.path.exists(os.path.join(tmp_path, d, "config.json"))]
    assert ckpts, os.listdir(tmp_path)


def test_driver_rejects_contract_violating_npz(tmp_path, monkeypatch):
    """A real file that violates the npz contract must fail AT LOAD with
    the validator's problem list, not as NaNs later; VAESNE_SKIP_VALIDATE=1
    bypasses (both via the driver CLI path)."""
    from vaesne_tpu.data import make_goldstein_like
    from vaesne_tpu.experiments.common import resolve_dataset

    data = make_goldstein_like(n=8, seed=0, spectrum_bins=48,
                               photometry_length=12)
    data["mask"] = (data["mask"] * 2).astype(data["mask"].dtype)  # not 0/1
    npz = os.path.join(tmp_path, "bad.npz")
    np.savez(npz, **data)
    monkeypatch.delenv("VAESNE_SKIP_VALIDATE", raising=False)
    with pytest.raises(ValueError, match="npz contract"):
        resolve_dataset(npz, "goldstein")
    monkeypatch.setenv("VAESNE_SKIP_VALIDATE", "1")
    loaded = resolve_dataset(npz, "goldstein")
    assert "flux" in loaded


@pytest.mark.slow
def test_eval_goldstein_predictive_flag(tmp_path):
    """`eval_goldstein predictive=1` must widen the CI band: the K draws
    sample the observed-point likelihood (scale 1), so the band's width is
    likelihood-dominated where the latent-only band's is not (VERDICT r4
    #6, PARITY.md "CI coverage")."""
    from vaesne_tpu.data import make_goldstein_like
    from vaesne_tpu.experiments import eval_goldstein
    from vaesne_tpu.experiments.train_photospectra import main as train_main

    data = make_goldstein_like(n=16, seed=0, spectrum_bins=48,
                               photometry_length=12)
    npz = os.path.join(tmp_path, "g.npz")
    np.savez(npz, **data)
    train_main([
        f"data={npz}", *_DRILL_TINY, *_DRILL_TRAIN,
        f"train.ckpt_dir={tmp_path}", f"train.log_dir={tmp_path / 'logs'}",
    ])
    ckpt = os.path.join(tmp_path, "goldstein_photospec_2-4_K1_beta1.0")
    common = [f"data={npz}", f"mm_ckpt={ckpt}", "K=16", "mesh=none"]
    m_lat = eval_goldstein.main(
        common + [f"out={tmp_path / 'lat'}"])
    m_pred = eval_goldstein.main(
        common + ["predictive=1", f"out={tmp_path / 'pred'}"])
    w_lat = float(np.nanmean(m_lat["mm_width_mean"]))
    w_pred = float(np.nanmean(m_pred["mm_width_mean"]))
    assert w_pred > 2 * w_lat, (w_lat, w_pred)
