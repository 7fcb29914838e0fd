"""Train the Goldstein photometry (light-curve) VAE.

Reference: cannon/test_photometry.py (flux-noise/time-shift/extra-mask
augmentation at :41-44, latent 4x2 model_dim 32 at :55-70, `elbo` loss,
AdamW lr 2.5e-4, 200 epochs, batch 32).

Usage:
  python -m vaesne_tpu.experiments.train_photometry [data=/path.npz]
      [train.epochs=50] [model.latent_dim=2] ...
"""

from __future__ import annotations

import sys

from .. import objectives
from ..data import augment_photometry, photometry_tuple
from ..models import PhotometricVAE
from ..utils.config import PhotometryVAEConfig, parse_overrides
from .common import parse_cli, resolve_dataset, split_tuples, train_loop


def build_model(cfg: PhotometryVAEConfig) -> PhotometricVAE:
    m = cfg.model
    cls = PhotometricVAE
    if m.bright:
        # model.bright=true → BrightPhotometricVAE (PhotometricVAE.py:226)
        from ..models import BrightPhotometricVAE as cls
    return cls(
        num_bands=cfg.num_bands,
        latent_len=m.latent_len,
        latent_dim=m.latent_dim,
        model_dim=m.model_dim,
        num_heads=m.num_heads,
        ff_dim=m.ff_dim,
        num_layers=m.num_layers,
        dropout=m.dropout,
        selfattn=m.selfattn,
        concat=m.concat,
        beta=cfg.train.beta,
    )


def main(argv=None):
    data_path, rest = parse_cli(list(sys.argv[1:] if argv is None else argv))
    cfg = parse_overrides(PhotometryVAEConfig(), rest)

    data = resolve_dataset(data_path, "goldstein", seed=cfg.train.seed)
    train_data, _ = split_tuples(data, photometry_tuple)
    model = build_model(cfg)

    def loss_fn(m, variables, batch, key):
        return objectives.elbo(m, variables, batch, K=cfg.train.K, key=key,
                               deterministic=False)

    state, losses = train_loop(
        model, train_data, loss_fn, cfg.train, config=cfg,
        augment_fn=augment_photometry,
        ckpt_name=f"goldstein_photometry_{cfg.model.latent_len}-{cfg.model.latent_dim}",
    )
    print(f"final loss: {losses[-1]:.6f}")
    return state, losses


if __name__ == "__main__":
    main()
