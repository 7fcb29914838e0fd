"""Evaluation subsystem tests: metrics math + sharded harness plumbing.

Pins the behavior mirrored from reference ``cannon/test/goldstein/``:
``get_metric``/``aggr_phase`` (evaluation.py:4-37), the shard aggregator key
layout (evaluation.py:81-97), |error|/sigma (eval_paramregression.py:62-69),
and the one-pass chunked device harness replacing the 400-job SLURM array.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaesne_tpu.evaluation.harness import (
    batched_apply,
    evaluate_mmvae,
    masking_sweep,
    mmvae_reconstruction_suite,
)
from vaesne_tpu.evaluation.metrics import (
    PHASE_BUCKETS,
    aggr_phase,
    aggregate_metrics,
    get_metric,
    regression_abs_error_in_sigma,
)


class TestGetMetric:
    def test_hand_computed_values(self):
        # K=5 samples, all equal to gt+delta: mean residual = -delta,
        # zero-width CI that misses gt (strict inequality, evaluation.py:9-10)
        gt = np.zeros((2, 3))
        spectra = np.full((5, 2, 3), 0.5)
        resi, cover, width = get_metric(spectra, gt)
        np.testing.assert_allclose(resi, -0.5)
        assert not cover.any()
        np.testing.assert_allclose(width, 0.0)

    def test_coverage_strictly_inside_band(self):
        # samples uniform on [-1, 1]: the 90% CI covers gt=0, not gt=2
        rng = np.random.default_rng(0)
        spectra = rng.uniform(-1, 1, size=(1000, 1, 4))
        _, cover_in, _ = get_metric(spectra, np.zeros((1, 4)))
        _, cover_out, _ = get_metric(spectra, np.full((1, 4), 2.0))
        assert cover_in.all()
        assert not cover_out.any()

    def test_quantile_width_alpha(self):
        # uniform [0,1] samples: 90% CI width ≈ 0.9, 50% CI width ≈ 0.5
        rng = np.random.default_rng(1)
        spectra = rng.uniform(0, 1, size=(4000, 2, 8))
        _, _, w90 = get_metric(spectra, np.zeros((2, 8)), alpha_level=0.1)
        _, _, w50 = get_metric(spectra, np.zeros((2, 8)), alpha_level=0.5)
        np.testing.assert_allclose(w90, 0.9, atol=0.02)
        np.testing.assert_allclose(w50, 0.5, atol=0.02)

    def test_nan_samples_ignored(self):
        # NaN posterior samples are dropped by nanmean/nanquantile, matching
        # the reference's np.nan* reductions (evaluation.py:5-8)
        spectra = np.ones((4, 1, 2))
        spectra[0] = np.nan
        resi, _, width = get_metric(spectra, np.ones((1, 2)))
        np.testing.assert_allclose(resi, 0.0)
        np.testing.assert_allclose(width, 0.0)


class TestAggrPhase:
    def test_bucketing_and_all_phase_width(self):
        # 2 events at phase -10 (residual 1), 1 at phase 0 (residual 3)
        resi = np.array([[1.0, 1.0], [1.0, 1.0], [3.0, 3.0]])
        cover = np.array([[True, False], [True, False], [True, True]])
        width = np.array([[2.0, 2.0], [2.0, 2.0], [8.0, 8.0]])
        phase = np.array([-10.0, -10.0, 0.0])
        rm, rs, cm, wm, ws, mse = aggr_phase(resi, cover, width, phase)
        assert len(rm) == len(PHASE_BUCKETS)
        np.testing.assert_allclose(rm[0], [1.0, 1.0])
        np.testing.assert_allclose(rm[1], [3.0, 3.0])
        np.testing.assert_allclose(cm[0], [1.0, 0.0])
        np.testing.assert_allclose(mse[0], 1.0)
        np.testing.assert_allclose(mse[1], 9.0)
        # the reference aggregates width over ALL phases (evaluation.py:32-33):
        # every bucket sees the same global width mean
        np.testing.assert_allclose(wm[0], wm[1])
        np.testing.assert_allclose(wm[0], [4.0, 4.0])

    def test_empty_bucket_is_nan(self):
        resi = np.ones((1, 2))
        cover = np.ones((1, 2), bool)
        width = np.ones((1, 2))
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            rm, *_ = aggr_phase(resi, cover, width, np.array([-10.0]))
        assert np.isnan(rm[1]).all()  # phase 0 bucket empty


class TestAggregateMetrics:
    def test_key_layout_and_phase_rounding(self):
        # avg_metrics.npz key convention: {name}_{metric} (evaluation.py:81-97)
        K, B, N = 8, 4, 6
        rng = np.random.default_rng(2)
        recon = rng.normal(size=(K, B, N))
        gt = rng.normal(size=(B, N))
        phase = np.array([-10.2, 0.3, 9.8, 20.1])  # rounds into buckets
        out = aggregate_metrics({"mm": recon}, {"mm": gt}, phase)
        for metric in ("resi_mean", "resi_sd", "coverage_mean",
                       "width_mean", "width_sd", "mse"):
            assert f"mm_{metric}" in out
            assert out[f"mm_{metric}"].shape[0] == len(PHASE_BUCKETS)
        assert out["mm_resi_mean"].shape == (len(PHASE_BUCKETS), N)
        # buckets -10, 0, 10, 20 populated; 30 empty -> NaN
        assert not np.isnan(out["mm_resi_mean"][0]).any()
        assert np.isnan(out["mm_resi_mean"][4]).all()


def test_regression_abs_error_in_sigma():
    pred = np.array([[1.0, 2.0]])
    target = np.array([[0.0, 4.0]])
    std = np.array([0.5, 2.0])
    np.testing.assert_allclose(
        regression_abs_error_in_sigma(pred, target, std), [[2.0, 1.0]]
    )


class TestBatchedApply:
    def test_matches_unchunked_and_unpads(self):
        # 10 rows, chunks of 4 (pads to 12): identical to one-shot apply;
        # mixed output axes are DECLARED, not guessed
        x = jnp.arange(10.0)[:, None] * jnp.ones((1, 3))
        fn = lambda c: {"y": c * 2.0, "k": jnp.stack([c, -c])}  # [B,..] and [K,B,..]
        out = batched_apply(fn, x, chunk_size=4, out_axes={"y": 0, "k": 1})
        np.testing.assert_allclose(out["y"], np.asarray(x) * 2.0)
        assert out["k"].shape == (2, 10, 3)
        np.testing.assert_allclose(out["k"][1], -np.asarray(x))

    def test_rejects_wrong_declared_axis(self):
        x = jnp.ones((4, 3))
        with pytest.raises(ValueError, match="out_axes declares batch axis"):
            batched_apply(lambda c: jnp.ones((7, 7)), x, chunk_size=4)

    def test_axis_one_equals_chunk_size_is_fine(self):
        # the old heuristic was ambiguous when K == chunk_size; the declared
        # axis isn't
        x = jnp.arange(8.0)
        K = 4
        out = batched_apply(lambda c: jnp.stack([c] * K), x, chunk_size=4,
                            out_axes=1)
        assert out.shape == (K, 8)
        np.testing.assert_allclose(out[0], np.arange(8.0))

    def test_tuple_data(self):
        data = (jnp.arange(6.0), jnp.arange(6.0) + 10.0)
        out = batched_apply(lambda c: c[0] + c[1], data, chunk_size=3)
        np.testing.assert_allclose(out, np.arange(6.0) * 2 + 10.0)

    def test_per_chunk_keys_are_independent(self):
        # with key=..., fn receives fold_in(key, chunk_i): different chunks
        # draw different noise (VERDICT r1: chunk-correlated CIs), while the
        # same call is reproducible
        x = jnp.zeros((8, 5))
        fn = lambda c, k: jax.random.normal(k, c.shape)
        out = batched_apply(fn, x, chunk_size=4, key=jax.random.PRNGKey(7))
        assert not np.allclose(out[:4], out[4:])
        out2 = batched_apply(fn, x, chunk_size=4, key=jax.random.PRNGKey(7))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


@pytest.fixture(scope="module")
def tiny_mmvae():
    from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE

    model = PhotoSpecMMVAE(
        vaes=[
            PhotometricVAE(num_bands=6, latent_len=2, latent_dim=2,
                           model_dim=8, ff_dim=8, num_layers=1, num_heads=2),
            SpectraVAE(latent_len=2, latent_dim=2, model_dim=8, ff_dim=8,
                       num_layers=1, num_heads=2),
        ],
        beta=1.0,
    )
    rng = np.random.default_rng(3)
    B, Lp, Ns = 6, 12, 24
    photo = (
        jnp.asarray(rng.normal(size=(B, Lp)), jnp.float32),
        jnp.asarray(np.sort(rng.uniform(-1, 1, (B, Lp)), axis=1), jnp.float32),
        jnp.asarray(rng.integers(0, 6, (B, Lp)), jnp.int32),
        jnp.asarray(rng.uniform(size=(B, Lp)) < 0.2),
    )
    spec = (
        jnp.asarray(rng.normal(size=(B, Ns)), jnp.float32),
        jnp.asarray(np.linspace(-1, 1, Ns)[None].repeat(B, 0), jnp.float32),
        jnp.asarray(rng.normal(size=(B,)), jnp.float32),
        jnp.asarray(rng.uniform(size=(B, Ns)) < 0.2),
    )
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, (photo, spec), 2)
    return model, variables, (photo, spec)


@pytest.mark.slow
class TestHarnessEndToEnd:
    def test_reconstruction_suite_shapes_and_chunking(self, tiny_mmvae):
        model, variables, batch = tiny_mmvae
        B, Ns = batch[1][0].shape
        Lp = batch[0][0].shape[1]
        K = 5
        recs = mmvae_reconstruction_suite(
            model, variables, batch, K=K, chunk_size=4,
            key=jax.random.PRNGKey(1),
        )
        assert recs["LC2spec"].shape == (K, B, Ns)
        assert recs["spec2LC"].shape == (K, B, Lp)
        assert recs["LCencode"].shape == (B, 2, 2)
        # chunking must not change results (same per-chunk key by design:
        # chunk_size >= B gives one chunk; compare 4-chunking vs whole)
        whole = mmvae_reconstruction_suite(
            model, variables, batch, K=K, chunk_size=B + 1,
            key=jax.random.PRNGKey(1),
        )
        np.testing.assert_allclose(
            recs["LCencode"], whole["LCencode"], rtol=1e-5, atol=1e-6
        )
        # posterior-sample noise must NOT be chunk-correlated: the second
        # chunk (rows 4:) draws from fold_in(key, 1), not the same stream
        # as a single-chunk pass
        assert not np.allclose(recs["LC2spec"][:, 4:], whole["LC2spec"][:, 4:])

    def test_denormalization(self, tiny_mmvae):
        model, variables, batch = tiny_mmvae
        raw = mmvae_reconstruction_suite(
            model, variables, batch, K=2, chunk_size=4, key=jax.random.PRNGKey(1)
        )
        norm = {"flux_std": 2.0, "flux_mean": 1.0,
                "photoflux_std": 3.0, "photoflux_mean": -1.0}
        den = mmvae_reconstruction_suite(
            model, variables, batch, K=2, chunk_size=4,
            key=jax.random.PRNGKey(1), norm=norm,
        )
        np.testing.assert_allclose(
            den["LC2spec"], raw["LC2spec"] * 2.0 + 1.0, rtol=1e-5
        )
        np.testing.assert_allclose(
            den["spec2LC"], raw["spec2LC"] * 3.0 - 1.0, rtol=1e-5
        )
        # posterior means stay raw (spect_cond_LC.py:128-136)
        np.testing.assert_allclose(den["LCencode"], raw["LCencode"], rtol=1e-6)

    def test_evaluate_mmvae_reuses_recs(self, tiny_mmvae):
        model, variables, batch = tiny_mmvae
        B, Ns = batch[1][0].shape
        recs = mmvae_reconstruction_suite(
            model, variables, batch, K=4, chunk_size=4, key=jax.random.PRNGKey(1)
        )
        phase = np.array([-10.0, 0.0, 10.0, 20.0, 30.0, 0.0])
        gt = np.asarray(batch[1][0])
        out = evaluate_mmvae(model, variables, batch, phase, gt, recs=recs)
        assert out["mm_resi_mean"].shape == (len(PHASE_BUCKETS), Ns)
        assert np.isfinite(out["mm_mse"]).all()

    def test_masking_sweep_monotone_structure(self, tiny_mmvae):
        model, variables, batch = tiny_mmvae
        B, Ns = batch[1][0].shape
        out = masking_sweep(
            model, variables, batch, missing_portions=(0.0, 0.9), K=3,
            chunk_size=4,
        )
        assert set(out) == {0.0, 0.9}
        for v in out.values():
            assert v.shape == (3, B, Ns)
            assert np.isfinite(v).all()

    def test_masking_sweep_mesh_matches_single_device(self, tiny_mmvae):
        """VERDICT r3 #8: the robustness sweep sharded over the mesh must
        reproduce the single-device result exactly (same chunking + keys,
        only the placement differs)."""
        from vaesne_tpu.parallel import make_mesh

        model, variables, batch = tiny_mmvae
        kw = dict(missing_portions=(0.0, 0.5), K=3, chunk_size=2)
        single = masking_sweep(model, variables, batch, **kw)
        meshed = masking_sweep(
            model, variables, batch,
            mesh=make_mesh(devices=jax.devices()[:2], data=2), **kw)
        for p in kw["missing_portions"]:
            np.testing.assert_allclose(single[p], meshed[p],
                                       rtol=1e-5, atol=1e-6)
