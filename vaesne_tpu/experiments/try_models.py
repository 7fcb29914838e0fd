"""Qualitative evaluation: reconstruction / cross-modal / generation figures.

Reference: cannon/try_photometry_model.py, try_spectra_model.py,
try_photospectra_model.py, try_img_model.py (load pickled model, K=100
posterior samples, matplotlib CI-band figures; cross matrix convention
``[0][0]`` LC→LC, ``[0][1]`` LC→spec, ... documented at
try_photospectra_model.py:78).

Usage:
  python -m vaesne_tpu.experiments.try_models [data=...] [mm_ckpt=...]
      [K=100] [n=4] [out=./figs]
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ..data import multimodal_tuple
from ..utils.config import PhotoSpectraMMVAEConfig
from ..utils.plotting import plot_lsst_lc, plot_spectra_samples
from .common import parse_cli, resolve_dataset
from .eval_goldstein import _restore
from .train_photospectra import build_model as build_mmvae


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    mm_ckpt, K, n_show, out_dir = None, 100, 4, "./figs"
    rest = []
    for a in argv:
        if a.startswith("mm_ckpt="):
            mm_ckpt = a.split("=", 1)[1]
        elif a.startswith("K="):
            K = int(a.split("=", 1)[1])
        elif a.startswith("n="):
            n_show = int(a.split("=", 1)[1])
        elif a.startswith("out="):
            out_dir = a.split("=", 1)[1]
        else:
            rest.append(a)
    data_path, rest = parse_cli(rest)

    data = resolve_dataset(data_path, "goldstein")
    te_idx = np.asarray(data["testing_idx"])[:n_show]
    batch = multimodal_tuple(data, idx=te_idx)
    key = jax.random.PRNGKey(0)

    model = build_mmvae(PhotoSpectraMMVAEConfig())
    variables = _restore(mm_ckpt, model, batch, key, K=1)

    # M x M reconstruction matrix, K posterior samples per cell
    recons = model.apply(variables, batch, K, method="reconstruct",
                         rngs={"sample": key})

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    photo, spec = batch
    names = [["LC2LC", "spec2LC"], ["LC2spec", "spec2spec"]]
    fig, axes = plt.subplots(n_show, 4, figsize=(18, 3 * n_show))
    axes = np.atleast_2d(axes)
    for i in range(n_show):
        # LC→LC and spec→LC on light-curve axes
        for col, (e, d) in enumerate([(0, 0), (1, 0)]):
            ax = axes[i, col]
            rec = np.asarray(recons[e][d])[:, i]  # [K, 60]
            plot_lsst_lc(np.asarray(photo[2][i]), rec.mean(0),
                         np.asarray(photo[1][i]), np.asarray(photo[3][i]), ax=ax)
            plot_lsst_lc(np.asarray(photo[2][i]), np.asarray(photo[0][i]),
                         np.asarray(photo[1][i]), np.asarray(photo[3][i]),
                         ax=ax, alpha=0.3)
            ax.set_title(names[e][0] if d == 0 else names[e][d])
        # LC→spec and spec→spec on spectrum axes
        for col, (e, d) in enumerate([(0, 1), (1, 1)], start=2):
            ax = axes[i, col]
            rec = np.asarray(recons[e][d])[:, i]  # [K, 982]
            plot_spectra_samples(rec, np.asarray(spec[1][i]),
                                 np.asarray(spec[3][i]), ax=ax)
            ax.plot(np.asarray(spec[1][i]), np.asarray(spec[0][i]),
                    color="k", lw=0.5, alpha=0.5)
            ax.set_title(names[e][1] if d == 1 else names[e][d])
    fig.tight_layout()
    path = os.path.join(out_dir, "cross_reconstructions.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")

    # prior generations conditioned on the first event's grids
    gens = model.apply(variables, 8, batch, method="generate",
                       rngs={"sample": key})
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    plot_spectra_samples(np.asarray(gens[1])[:, 0], np.asarray(spec[1][0]),
                         np.asarray(spec[3][0]), ax=axes[1])
    plot_lsst_lc(np.asarray(photo[2][0]), np.asarray(gens[0])[:, 0].mean(0),
                 np.asarray(photo[1][0]), np.asarray(photo[3][0]), ax=axes[0])
    axes[0].set_title("prior generation: light curve")
    axes[1].set_title("prior generation: spectra")
    fig.tight_layout()
    path = os.path.join(out_dir, "generations.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
