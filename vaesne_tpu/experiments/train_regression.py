"""Train Goldstein physical-parameter regression heads (all 6 variants).

Reference: cannon/photometry2goldstein_{mmvae,contrast,end2end}.py and
spec2goldstein_{...}.py — MLP heads mapping a light curve or spectrum to the
4 Goldstein simulation parameters, on (a) a frozen MMVAE backbone
(regression.py:9-26), (b) a frozen contrastive tower (regression.py:28-65),
or (c) an end-to-end-trained encoder (regression.py:69-141). Labels are
regex-parsed from data filenames and standardized, with the normalization
saved for eval (photometry2goldstein_mmvae.py:24-40).

Usage:
  python -m vaesne_tpu.experiments.train_regression modality=photometry \
      backbone=mmvae [backbone_ckpt=./ckpt/goldstein_photospec_...] [k=v ...]

``modality`` in {photometry, spec}; ``backbone`` in {mmvae, contrast,
end2end}. Without ``backbone_ckpt`` a freshly-initialized (untrained)
backbone is used — useful for smoke runs.
"""

from __future__ import annotations

import json
import os
import sys

import jax
import numpy as np

from .. import objectives
from ..data import goldstein_labels, multimodal_tuple, photometry_tuple, spectra_tuple
from ..models import (
    ContraPhotoRegressionHead,
    ContraSpecRegressionHead,
    PhotoEnd2EndRegression,
    SpecEnd2EndRegression,
    VAERegressionHead,
)
from ..utils.config import RegressionConfig, parse_overrides
from .common import parse_cli, resolve_dataset, train_loop
from .train_contrastive import build_model as build_contrastive
from .train_photospectra import build_model as build_mmvae


def frozen_param_mask(params, frozen):
    """Boolean pytree: True = trainable (head), False = frozen backbone
    subtree(s). Used with optax.masked so AdamW never touches (not even
    weight-decays) the installed pretrained weights."""
    frozen_keys = set(frozen or {})
    return jax.tree_util.tree_map_with_path(
        lambda path, _: getattr(path[0], "key", None) not in frozen_keys,
        params,
    )


def _load_backbone_params(ckpt_path, model, example, key, K=1, has_sample_rng=True):
    """Restore backbone params from a train_loop checkpoint, or initialize
    fresh ones when no checkpoint is given."""
    from ..training import TrainState, adamw, init_model
    from ..utils.checkpoint import restore_checkpoint

    params = init_model(model, example, key, K=K, has_sample_rng=has_sample_rng)
    if ckpt_path:
        template = TrainState.create(params, adamw(1e-4), key)
        params = restore_checkpoint(ckpt_path, template).params
    return params


def build_head(modality, backbone, mm_cfg_builder=None, ckpt=None, example=None,
               key=None, cfg=None):
    """Assemble the regression module (+ pretrained backbone params)."""
    mod_idx = 0 if modality == "photometry" else 1
    if backbone == "mmvae":
        mm = build_mmvae(mm_cfg_builder())
        params = _load_backbone_params(ckpt, mm, example, key, K=1)
        vae = mm.vaes[mod_idx]
        sub = params["vaes_" + str(mod_idx)] if "vaes_" + str(mod_idx) in params else params
        head = VAERegressionHead(vae=vae, outdim=cfg.outdim, mlp_hidden=cfg.mlp_hidden)
        return head, {"vae": sub}
    if backbone == "contrast":
        cn = build_contrastive(mm_cfg_builder())
        params = _load_backbone_params(ckpt, cn, example, key, has_sample_rng=False)
        cls = ContraPhotoRegressionHead if mod_idx == 0 else ContraSpecRegressionHead
        head = cls(contrastnet=cn, outdim=cfg.outdim, mlp_hidden=cfg.mlp_hidden)
        return head, {"contrastnet": params}
    if backbone == "end2end":
        cls = PhotoEnd2EndRegression if mod_idx == 0 else SpecEnd2EndRegression
        head = cls(outdim=cfg.outdim, mlp_hidden=cfg.mlp_hidden)
        return head, None
    raise ValueError(f"unknown backbone {backbone!r}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    modality, backbone, backbone_ckpt = "photometry", "mmvae", None
    rest = []
    for a in argv:
        if a.startswith("modality="):
            modality = a.split("=", 1)[1]
        elif a.startswith("backbone="):
            backbone = a.split("=", 1)[1]
        elif a.startswith("backbone_ckpt="):
            backbone_ckpt = a.split("=", 1)[1]
        else:
            rest.append(a)
    data_path, rest = parse_cli(rest)
    cfg = parse_overrides(RegressionConfig(), rest)

    data = resolve_dataset(data_path, "goldstein", seed=cfg.train.seed)
    tr_idx = np.asarray(data["training_idx"])

    labels = goldstein_labels(data, tr_idx)
    mean, std = labels.mean(0), labels.std(0) + 1e-8
    labels = (labels - mean) / std
    os.makedirs(cfg.train.ckpt_dir, exist_ok=True)
    with open(os.path.join(cfg.train.ckpt_dir, "goldstein_normalizing.json"), "w") as f:
        json.dump({"mean": mean.tolist(), "std": std.tolist()}, f)

    builder = photometry_tuple if modality == "photometry" else spectra_tuple
    x_train = builder(data, idx=tr_idx)
    key = jax.random.PRNGKey(cfg.train.seed)

    from ..utils.config import ContrastiveConfig, PhotoSpectraMMVAEConfig

    mm_cfg_builder = (
        (lambda: PhotoSpectraMMVAEConfig()) if backbone == "mmvae"
        else (lambda: ContrastiveConfig())
    )
    backbone_example = (
        multimodal_tuple(data, idx=tr_idx[:2]) if backbone in ("mmvae", "contrast")
        else None
    )
    head, frozen = build_head(
        modality, backbone, mm_cfg_builder, backbone_ckpt,
        backbone_example, key, cfg,
    )

    import jax.numpy as jnp

    train_data = (x_train, jnp.asarray(labels))

    def loss_fn(m, variables, batch, key):
        x, y = batch
        return objectives.mse(m, variables, x, y, key=key, deterministic=False)

    # Install the real (pretrained) backbone weights INTO the head's params
    # and mask them out of the optimizer: the checkpoint then contains the
    # true backbone (so eval restores everything from the head checkpoint
    # alone) and AdamW's weight decay cannot corrupt the frozen subtree.
    state, losses = train_loop(
        head, train_data, loss_fn, cfg.train, config=cfg,
        has_sample_rng=False,
        init_data=x_train,
        install_params=frozen,
        opt_mask=(lambda p: frozen_param_mask(p, frozen)) if frozen else None,
        ckpt_name=f"goldstein_{modality}2param_{backbone}",
    )
    print(f"final loss: {losses[-1]:.6f}")
    return state, losses


if __name__ == "__main__":
    main()
