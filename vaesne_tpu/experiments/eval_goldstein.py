"""Quantitative Goldstein evaluation: residual / CI coverage / CI width / MSE
per phase bucket, in ONE sharded device pass.

Replaces the reference's 400-job SLURM array + aggregator
(cannon/test/goldstein/spect_cond_LC.py + evaluation.py + plot_metric.py):
the whole test set runs as fixed-shape jitted chunks (SURVEY §2.4 row
"Multi-job sharding"), producing the same ``avg_metrics.npz`` layout and the
3x5 metric figure.

Usage:
  python -m vaesne_tpu.experiments.eval_goldstein \
      [data=/path.npz] [mm_ckpt=./ckpt/goldstein_photospec_...] \
      [spec_ckpt=...] [K=100] [out=./res] [predictive=1]
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ..data import multimodal_tuple
from ..evaluation import evaluate_mmvae
from ..utils.config import PhotoSpectraMMVAEConfig, SpectraVAEConfig
from .common import parse_cli, resolve_dataset
from .train_photospectra import build_model as build_mmvae
from .train_spectra import build_model as build_specvae


def _restore(ckpt, model, example, key, K=1, has_sample_rng=True,
             train_cfg=None):
    """Init + (optionally) restore ``{"params": ...}`` from a checkpoint.

    Pass the checkpoint's ``train_cfg`` (from ``restore_config``) so the
    restore template's optimizer state mirrors how the run was trained —
    clipping on/off changes the optax state structure."""
    from ..training import TrainState, adamw, init_model
    from ..utils.checkpoint import restore_checkpoint
    from .common import optimizer_from_config

    params = init_model(model, example, key, K=K, has_sample_rng=has_sample_rng)
    if ckpt:
        opt = (optimizer_from_config(train_cfg) if train_cfg is not None
               else adamw(1e-4))
        template = TrainState.create(params, opt, key)
        params = restore_checkpoint(ckpt, template).params
    return {"params": params}


def _config_for(ckpt, default_cls):
    """The config a checkpoint was trained with (its ``config.json``), or
    the driver default when no checkpoint / no saved config is given —
    VERDICT round 1 item 2: eval must rebuild the EXACT architecture."""
    from ..utils.checkpoint import restore_config

    cfg = restore_config(ckpt, default_cls) if ckpt else None
    return cfg if cfg is not None else default_cls()


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    mm_ckpt = spec_ckpt = None
    K, out_dir, mesh_spec = 100, "./res", "auto"
    predictive = False
    rest = []
    for a in argv:
        if a.startswith("mm_ckpt="):
            mm_ckpt = a.split("=", 1)[1]
        elif a.startswith("spec_ckpt="):
            spec_ckpt = a.split("=", 1)[1]
        elif a.startswith("predictive="):
            # predictive=1: K draws sample the observed-point likelihood, so
            # coverage/width evaluate the model's calibrated predictive band
            # instead of the reference's latent-only spread (PARITY.md
            # "CI coverage"; harness predictive=True)
            predictive = a.split("=", 1)[1].lower() in ("1", "true", "yes")
        elif a.startswith("K="):
            K = int(a.split("=", 1)[1])
        elif a.startswith("out="):
            out_dir = a.split("=", 1)[1]
        elif a.startswith("mesh="):
            mesh_spec = a.split("=", 1)[1]
        else:
            rest.append(a)
    data_path, rest = parse_cli(rest)
    # data-parallel eval over all chips by default (the reference needed a
    # 400-job SLURM array for this, spect_cond_LC.sh); mesh=none forces chip 0
    from ..parallel import resolve_mesh

    mesh = resolve_mesh(mesh_spec, batch_size=64)  # harness chunk_size

    data = resolve_dataset(data_path, "goldstein")
    te_idx = np.asarray(data["testing_idx"])
    test_batch = multimodal_tuple(data, idx=te_idx)
    key = jax.random.PRNGKey(0)

    mm_cfg = _config_for(mm_ckpt, PhotoSpectraMMVAEConfig)
    mm_model = build_mmvae(mm_cfg)
    example = jax.tree_util.tree_map(lambda a: a[:2], test_batch)
    mm_vars = _restore(mm_ckpt, mm_model, example, key, K=1,
                       train_cfg=mm_cfg.train)

    spec_only = None
    if spec_ckpt is not None:
        s_cfg = _config_for(spec_ckpt, SpectraVAEConfig)
        s_model = build_specvae(s_cfg)
        spec_only = (s_model, _restore(spec_ckpt, s_model, example[1], key,
                                       train_cfg=s_cfg.train))

    # physical phase + ground truth for metric bucketing (evaluation.py:16-37)
    phase_phys = (
        np.asarray(data["phase"])[te_idx] * float(data["phase_std"])
        + float(data["phase_mean"])
    )
    gt_spectra = (
        np.asarray(data["flux"])[te_idx] * float(data["flux_std"])
        + float(data["flux_mean"])
    )
    norm = {k: float(data[k]) for k in
            ("flux_mean", "flux_std", "photoflux_mean", "photoflux_std")}

    from ..evaluation.harness import mmvae_reconstruction_suite

    recs = mmvae_reconstruction_suite(
        mm_model, mm_vars, test_batch, K=K, key=key,
        spec_only=spec_only, norm=norm, mesh=mesh, predictive=predictive,
    )
    # reuse the (denormalized) reconstructions — one inference pass total,
    # and metric units consistently physical
    metrics = evaluate_mmvae(
        mm_model, mm_vars, test_batch, phase_phys, gt_spectra,
        K=K, key=key, spec_only=spec_only, recs=recs, mesh=mesh,
    )

    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "reconstructions.npz"), **recs)
    np.savez(os.path.join(out_dir, "avg_metrics.npz"), **metrics)
    for k, v in sorted(metrics.items()):
        if np.asarray(v).size <= 10:
            print(f"{k}: {np.asarray(v).ravel()}")
    try:
        from ..utils.plotting import plot_metric_grid

        plot_metric_grid(metrics, path=os.path.join(out_dir, "metrics.png"))
    except Exception as e:  # plotting is best-effort on headless boxes
        print(f"(metric figure skipped: {e})")
    print(f"wrote {out_dir}/avg_metrics.npz")
    return metrics


if __name__ == "__main__":
    main()
