"""Train the spectra-only VAE on real ZTF observations.

Reference: cannon/ZTF_spectonly.py (x10 repeat augmentation + flux noise +
5-10% random extra masking at :33-41, latent 4x4 beta=0.5 lr 1e-3 at
:48-69). The reference script also passes a stale ``spectra_length`` kwarg
that TypeErrors against its own package (ZTF_spectonly.py:57) — the intended
config is reproduced here.

Usage: python -m vaesne_tpu.experiments.train_ztf_spectra [data=/path.npz] [k=v ...]
"""

from __future__ import annotations

import sys

from .. import objectives
from ..data import augment_spectra, repeat_dataset, spectra_tuple
from ..models import SpectraVAE
from ..utils.config import ZTFSpectraConfig, parse_overrides
from .common import parse_cli, resolve_dataset, split_tuples, train_loop


def build_model(cfg: ZTFSpectraConfig) -> SpectraVAE:
    m = cfg.model
    cls = SpectraVAE
    if m.bright:
        # model.bright=true → BrightSpectraVAE, the class the reference's
        # ZTF spectra script actually imports (ZTF_spectonly.py:12)
        from ..models import BrightSpectraVAE as cls
    return cls(
        latent_len=m.latent_len, latent_dim=m.latent_dim, model_dim=m.model_dim,
        num_heads=m.num_heads, ff_dim=m.ff_dim, num_layers=m.num_layers,
        dropout=m.dropout, selfattn=m.selfattn, concat=m.concat,
        beta=cfg.train.beta,
    )


def main(argv=None):
    data_path, rest = parse_cli(list(sys.argv[1:] if argv is None else argv))
    cfg = parse_overrides(ZTFSpectraConfig(), rest)

    data = resolve_dataset(data_path, "ztf", seed=cfg.train.seed)
    train_data, _ = split_tuples(data, spectra_tuple)
    train_data = repeat_dataset(train_data, cfg.repeat_factor)

    model = build_model(cfg)

    def loss_fn(mod, variables, batch, key):
        return objectives.elbo(mod, variables, batch, K=cfg.train.K, key=key,
                               deterministic=False)

    def augment(key, batch):
        return augment_spectra(key, batch, extra_mask_prob=cfg.extra_mask_prob)

    state, losses = train_loop(
        model, train_data, loss_fn, cfg.train, config=cfg,
        augment_fn=augment,
        ckpt_name=f"ztf_spectra_{cfg.model.latent_len}-{cfg.model.latent_dim}",
    )
    print(f"final loss: {losses[-1]:.6f}")
    return state, losses


if __name__ == "__main__":
    main()
