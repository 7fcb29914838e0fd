"""Train the contrastive (InfoNCE) photometry/spectra two-tower network.

Reference: cannon/test_photospectra_contrast.py (towers at :92-116,
`negInfoNCE` tau=0.1 via training_step multimodal at :125-127, lr 2.5e-4,
500 epochs).

Usage: python -m vaesne_tpu.experiments.train_contrastive [data=/path.npz] [k=v ...]
"""

from __future__ import annotations

import sys

from .. import objectives
from ..data import augment_multimodal, multimodal_tuple
from ..models import ContraPhotSpec
from ..utils.config import ContrastiveConfig, parse_overrides
from .common import parse_cli, resolve_dataset, split_tuples, train_loop


def build_model(cfg: ContrastiveConfig) -> ContraPhotSpec:
    m = cfg.model
    return ContraPhotSpec(
        latent_len=m.latent_len,
        latent_dim=m.latent_dim,
        proj_dim=cfg.proj_dim,
        num_bands=cfg.num_bands,
        photo_model_dim=m.model_dim,
        photo_num_heads=m.num_heads,
        photo_ff_dim=m.ff_dim,
        photo_num_layers=m.num_layers,
        photo_dropout=m.dropout,
        spec_model_dim=m.model_dim,
        spec_num_heads=m.num_heads,
        spec_ff_dim=m.ff_dim,
        spec_num_layers=m.num_layers,
        spec_dropout=m.dropout,
        selfattn=m.selfattn,
    )


def main(argv=None):
    data_path, rest = parse_cli(list(sys.argv[1:] if argv is None else argv))
    cfg = parse_overrides(ContrastiveConfig(), rest)

    if cfg.train.accum_steps > 1:
        import warnings

        warnings.warn(
            "accum_steps > 1 with InfoNCE shrinks each anchor's negative "
            "pool to the microbatch: this optimizes a weaker contrastive "
            "objective than the whole-batch loss (InfoNCE is not "
            "microbatch-decomposable). Proceeding, but the result is NOT "
            "equivalent to accum_steps=1 at the same global batch.",
            stacklevel=1,
        )

    data = resolve_dataset(data_path, "goldstein", seed=cfg.train.seed)
    train_data, _ = split_tuples(data, multimodal_tuple)
    model = build_model(cfg)

    def loss_fn(m, variables, batch, key):
        return objectives.neg_info_nce(
            m, variables, batch, temperature=cfg.temperature, key=key,
            deterministic=False,
        )

    state, losses = train_loop(
        model, train_data, loss_fn, cfg.train, config=cfg,
        augment_fn=augment_multimodal,
        has_sample_rng=False,
        ckpt_name=f"goldstein_contrastive_{cfg.model.latent_len}-{cfg.model.latent_dim}_proj{cfg.proj_dim}",
    )
    print(f"final loss: {losses[-1]:.6f}")
    return state, losses


if __name__ == "__main__":
    main()
