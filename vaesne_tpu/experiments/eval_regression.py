"""Evaluate parameter-regression heads: |error| in label-sigma units.

Reference: cannon/test/goldstein/eval_paramregression.py (:62-91) — residuals
of the mmvae / contrastive / end2end heads on the test split, in units of the
training-label standard deviation, written as
``avg_absdiff_LC2goldstein_param.npz``.

Usage:
  python -m vaesne_tpu.experiments.eval_regression modality=photometry \
      backbone=mmvae head_ckpt=./ckpt/goldstein_photometry2param_mmvae \
      [data=...] [out=./res]
"""

from __future__ import annotations

import json
import os
import sys

import jax
import numpy as np

from ..data import goldstein_labels, multimodal_tuple, photometry_tuple, spectra_tuple
from ..utils.config import RegressionConfig, parse_overrides
from .common import parse_cli, resolve_dataset
from .train_regression import build_head


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    modality, backbone, head_ckpt, out_dir = "photometry", "mmvae", None, "./res"
    mesh_spec = "auto"
    rest = []
    for a in argv:
        if a.startswith("modality="):
            modality = a.split("=", 1)[1]
        elif a.startswith("backbone="):
            backbone = a.split("=", 1)[1]
        elif a.startswith("head_ckpt="):
            head_ckpt = a.split("=", 1)[1]
        elif a.startswith("out="):
            out_dir = a.split("=", 1)[1]
        elif a.startswith("mesh="):
            mesh_spec = a.split("=", 1)[1]
        else:
            rest.append(a)
    data_path, rest = parse_cli(rest)
    cfg = parse_overrides(RegressionConfig(), rest)

    data = resolve_dataset(data_path, "goldstein")
    tr_idx = np.asarray(data["training_idx"])
    te_idx = np.asarray(data["testing_idx"])

    # label normalization from the training split (the reference loads the
    # saved goldstein_normalizing.pt; recomputed identically here, or read
    # from the JSON the train driver wrote)
    norm_file = os.path.join(cfg.train.ckpt_dir, "goldstein_normalizing.json")
    if os.path.exists(norm_file):
        with open(norm_file) as f:
            d = json.load(f)
        mean, std = np.asarray(d["mean"]), np.asarray(d["std"])
    else:
        tr_labels = goldstein_labels(data, tr_idx)
        mean, std = tr_labels.mean(0), tr_labels.std(0) + 1e-8

    te_labels = (goldstein_labels(data, te_idx) - mean) / std

    builder = photometry_tuple if modality == "photometry" else spectra_tuple
    x_test = builder(data, idx=te_idx)
    key = jax.random.PRNGKey(0)

    from ..utils.config import ContrastiveConfig, PhotoSpectraMMVAEConfig

    mm_cfg_builder = (
        (lambda: PhotoSpectraMMVAEConfig()) if backbone == "mmvae"
        else (lambda: ContrastiveConfig())
    )
    backbone_example = (
        multimodal_tuple(data, idx=te_idx[:2]) if backbone in ("mmvae", "contrast")
        else None
    )
    head, frozen = build_head(modality, backbone, mm_cfg_builder, None,
                              backbone_example, key, cfg)

    from ..training import TrainState, adamw, init_model
    from ..utils.checkpoint import restore_checkpoint

    example_x = jax.tree_util.tree_map(lambda a: a[:2], x_test)
    params = init_model(head, example_x, key, has_sample_rng=False)
    if head_ckpt:
        # the train driver checkpoints the FULL params (head + installed
        # backbone); the template must mirror its (masked) optimizer so the
        # restored pytree structure matches
        import optax

        from .train_regression import frozen_param_mask

        # head init only materializes the submodules its forward calls
        # (e.g. vae.enc, not vae.dec); merge the full backbone structure so
        # the template matches the saved pytree exactly
        tmpl_params = {**params, **(frozen or {})}
        opt = adamw(cfg.train.lr)
        if frozen:
            opt = optax.masked(opt, frozen_param_mask(tmpl_params, frozen))
        template = TrainState.create(tmpl_params, opt, key)
        params = restore_checkpoint(head_ckpt, template).params
        variables = {"params": params}
    else:
        # smoke mode: freshly initialized head over the fresh backbone
        variables = {"params": {**params, **(frozen or {})}}

    # fixed-shape chunks sharded over the data mesh (all chips; the
    # reference's equivalent ran per-head CPU jobs, eval_paramregression.py)
    from ..evaluation.harness import batched_apply
    from ..parallel import resolve_mesh

    mesh = resolve_mesh(mesh_spec, batch_size=256)  # chunk_size below
    pred_fn = jax.jit(lambda x: head.apply(variables, x, True))
    pred = batched_apply(pred_fn, x_test, chunk_size=256, out_axes=0,
                         mesh=mesh)
    absdiff = np.abs(np.asarray(pred) - te_labels)  # already in sigma units

    os.makedirs(out_dir, exist_ok=True)
    out_name = f"avg_absdiff_{modality}2goldstein_param_{backbone}.npz"
    np.savez(os.path.join(out_dir, out_name),
             absdiff=absdiff, mean=absdiff.mean(0), per_param=absdiff.mean(0))
    print(f"|error|/sigma per param: {absdiff.mean(0)}")
    print(f"wrote {out_dir}/{out_name}")
    return absdiff


if __name__ == "__main__":
    main()
