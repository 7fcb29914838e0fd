"""Robustness sweep: mask 0-90% of the light curve, cross-reconstruct spectra.

Reference: cannon/test/goldstein/gradual_masking.py (missing portions
{0,10,30,50,70,90}% at :67, seed 42 at :83, LC→spec reconstruction quality
vs masking level) + plot_masking.py — as one device pass.

Usage:
  python -m vaesne_tpu.experiments.eval_masking [data=...] [mm_ckpt=...]
      [K=100] [out=./res]
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ..data import multimodal_tuple
from ..evaluation.harness import masking_sweep
from ..utils.config import PhotoSpectraMMVAEConfig, parse_overrides
from .common import parse_cli, resolve_dataset
from .eval_goldstein import _config_for, _restore
from .train_photospectra import build_model as build_mmvae


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    mm_ckpt, K, out_dir, mesh_spec = None, 100, "./res", "auto"
    rest = []
    for a in argv:
        if a.startswith("mm_ckpt="):
            mm_ckpt = a.split("=", 1)[1]
        elif a.startswith("K="):
            K = int(a.split("=", 1)[1])
        elif a.startswith("out="):
            out_dir = a.split("=", 1)[1]
        elif a.startswith("mesh="):
            mesh_spec = a.split("=", 1)[1]
        else:
            rest.append(a)
    data_path, rest = parse_cli(rest)
    from ..parallel import resolve_mesh

    mesh = resolve_mesh(mesh_spec, batch_size=32)  # sweep chunk_size

    data = resolve_dataset(data_path, "goldstein")
    te_idx = np.asarray(data["testing_idx"])
    test_batch = multimodal_tuple(data, idx=te_idx)
    key = jax.random.PRNGKey(0)

    # config comes from the checkpoint's config.json (e.g. a latlen-2 model
    # trained via `train_photospectra model.latent_len=2`, the analog of the
    # reference's --latlen sweep arm in more_masking.sh); remaining CLI
    # overrides (model.latent_len=2 ...) apply on top for ckpt-less smoke runs
    mm_cfg = parse_overrides(_config_for(mm_ckpt, PhotoSpectraMMVAEConfig), rest)
    mm_model = build_mmvae(mm_cfg)
    example = jax.tree_util.tree_map(lambda a: a[:2], test_batch)
    mm_vars = _restore(mm_ckpt, mm_model, example, key, K=1,
                       train_cfg=mm_cfg.train)

    sweep = masking_sweep(mm_model, mm_vars, test_batch, K=K, mesh=mesh)

    gt = (
        np.asarray(data["flux"])[te_idx] * float(data["flux_std"])
        + float(data["flux_mean"])
    )
    os.makedirs(out_dir, exist_ok=True)
    mses = {}
    for portion, recs in sweep.items():
        rec = recs * float(data["flux_std"]) + float(data["flux_mean"])
        spec_mask = np.asarray(test_batch[1][3])  # True == missing
        obs = ~spec_mask
        mse = float((((rec.mean(0) - gt) ** 2) * obs).sum() / obs.sum())
        mses[portion] = mse
        print(f"masking {int(portion * 100):2d}%: LC->spec MSE {mse:.6f}")
    np.savez(
        os.path.join(out_dir, "masking_sweep.npz"),
        portions=np.array(sorted(mses)),
        mse=np.array([mses[p] for p in sorted(mses)]),
    )
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        ps = sorted(mses)
        ax.plot([100 * p for p in ps], [mses[p] for p in ps], marker="o")
        ax.set_xlabel("% of observed light-curve points masked")
        ax.set_ylabel("LC->spec reconstruction MSE")
        ax.set_title("Cross-modal robustness to light-curve masking")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "masking_sweep.png"), dpi=120)
        plt.close(fig)
    except Exception as e:  # plotting is best-effort (plot_masking.py analog)
        print(f"(masking figure skipped: {e})")
    print(f"wrote {out_dir}/masking_sweep.npz")
    return mses


if __name__ == "__main__":
    main()
