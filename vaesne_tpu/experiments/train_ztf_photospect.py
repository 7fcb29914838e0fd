"""Train the photometry+spectra MoE-MMVAE on real ZTF data (2 bands).

Reference: cannon/ZTF_photospect.py (x10 repeat + noise + 5-10% masking at
:44-66, `m_iwae` K=8 beta=0.5 lr 1e-3 at :78-128; its stale
``photometric_length`` kwargs at :89,104 are dropped — fixed shapes come from
the data).

Usage: python -m vaesne_tpu.experiments.train_ztf_photospect [data=/path.npz] [k=v ...]
"""

from __future__ import annotations

import sys

from .. import objectives
from ..data import augment_multimodal, multimodal_tuple, repeat_dataset
from ..models import PhotometricVAE, PhotoSpecMMVAE, SpectraVAE
from ..utils.config import ZTFMMVAEConfig, parse_overrides
from .common import parse_cli, resolve_dataset, split_tuples, train_loop


def build_model(cfg: ZTFMMVAEConfig) -> PhotoSpecMMVAE:
    m = cfg.model
    shared = dict(
        latent_len=m.latent_len, latent_dim=m.latent_dim, model_dim=m.model_dim,
        num_heads=m.num_heads, ff_dim=m.ff_dim, num_layers=m.num_layers,
        dropout=m.dropout, selfattn=m.selfattn, concat=m.concat,
    )
    photo_cls, spec_cls = PhotometricVAE, SpectraVAE
    if m.bright:
        # model.bright=true → Bright sub-VAEs (ZTF_photospect.py imports)
        from ..models import BrightPhotometricVAE as photo_cls
        from ..models import BrightSpectraVAE as spec_cls
    return PhotoSpecMMVAE(
        vaes=[
            photo_cls(num_bands=cfg.num_bands, **shared),
            spec_cls(**shared),
        ],
        beta=cfg.train.beta,
    )


def main(argv=None):
    data_path, rest = parse_cli(list(sys.argv[1:] if argv is None else argv))
    cfg = parse_overrides(ZTFMMVAEConfig(), rest)

    data = resolve_dataset(data_path, "ztf", seed=cfg.train.seed)
    train_data, _ = split_tuples(data, multimodal_tuple)
    train_data = repeat_dataset(train_data, cfg.repeat_factor)
    model = build_model(cfg)

    def loss_fn(m, variables, batch, key):
        return objectives.m_iwae(m, variables, batch, K=cfg.train.K, key=key,
                                 deterministic=False)

    state, losses = train_loop(
        model, train_data, loss_fn, cfg.train, config=cfg,
        augment_fn=augment_multimodal,
        ckpt_name=(
            f"ztf_photospec_{cfg.model.latent_len}-{cfg.model.latent_dim}"
            f"_K{cfg.train.K}_beta{cfg.train.beta}"
        ),
    )
    print(f"final loss: {losses[-1]:.6f}")
    return state, losses


if __name__ == "__main__":
    main()
