"""Qualitative evaluation: reconstruction / cross-modal / generation figures.

Reference: cannon/try_photometry_model.py, try_spectra_model.py,
try_photospectra_model.py, try_img_model.py (load pickled model, K=100
posterior samples, matplotlib CI-band figures; cross matrix convention
``[0][0]`` LC→LC, ``[0][1]`` LC→spec, ... documented at
try_photospectra_model.py:78).

Usage:
  python -m vaesne_tpu.experiments.try_models [model=mmvae|photometry|spectra|image]
      [data=...] [mm_ckpt=...] [K=100] [n=4] [out=./figs]
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from ..data import multimodal_tuple, photometry_tuple, spectra_tuple
from ..utils.config import PhotoSpectraMMVAEConfig
from ..utils.plotting import plot_lsst_lc, plot_spectra_samples
from .common import parse_cli, resolve_dataset
from .eval_goldstein import _restore
from .train_photospectra import build_model as build_mmvae


def try_unimodal(which, data_path, ckpt, K, n_show, out_dir):
    """Qualitative reconstructions for a single-modality VAE
    (try_photometry_model.py / try_spectra_model.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils.config import PhotometryVAEConfig, SpectraVAEConfig
    from .train_photometry import build_model as build_photo
    from .train_spectra import build_model as build_spec

    data = resolve_dataset(data_path, "goldstein")
    te_idx = np.asarray(data["testing_idx"])[:n_show]
    if which == "photometry":
        batch = photometry_tuple(data, idx=te_idx)
        model = build_photo(PhotometryVAEConfig())
    else:
        batch = spectra_tuple(data, idx=te_idx)
        model = build_spec(SpectraVAEConfig())
    key = jax.random.PRNGKey(0)
    variables = _restore(ckpt, model, batch, key, K=1)
    recon = model.apply(variables, batch, K, method="reconstruct",
                        rngs={"sample": key})
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(1, n_show, figsize=(4.5 * n_show, 3.5))
    for i, ax in enumerate(np.atleast_1d(axes)):
        rec = np.asarray(recon)[:, i]
        if which == "photometry":
            plot_lsst_lc(np.asarray(batch[2][i]), rec.mean(0),
                         np.asarray(batch[1][i]), np.asarray(batch[3][i]), ax=ax)
            plot_lsst_lc(np.asarray(batch[2][i]), np.asarray(batch[0][i]),
                         np.asarray(batch[1][i]), np.asarray(batch[3][i]),
                         ax=ax, alpha=0.3)
        else:
            plot_spectra_samples(rec, np.asarray(batch[1][i]),
                                 np.asarray(batch[3][i]), ax=ax)
            ax.plot(np.asarray(batch[1][i]), np.asarray(batch[0][i]),
                    color="k", lw=0.5, alpha=0.5)
    fig.tight_layout()
    path = os.path.join(out_dir, f"{which}_reconstructions.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")


def try_image(data_path, ckpt, K, n_show, out_dir):
    """Qualitative image reconstructions (try_img_model.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax.numpy as jnp

    from ..data import make_images
    from ..utils.config import ImageVAEConfig
    from .train_image import main as _unused  # noqa: F401

    cfg = ImageVAEConfig()
    from ..models import HostImgVAE

    m = cfg.model
    model = HostImgVAE(
        img_size=cfg.img_size, patch_size=cfg.patch_size,
        in_channels=cfg.in_channels, hybrid=cfg.hybrid,
        latent_len=m.latent_len, latent_dim=m.latent_dim, model_dim=m.model_dim,
        num_heads=m.num_heads, ff_dim=m.ff_dim, num_layers=m.num_layers,
    )
    images = make_images(n=n_show, img_size=cfg.img_size,
                         channels=cfg.in_channels)
    batch = (jnp.asarray(images), jnp.zeros((n_show, 0), jnp.float32))
    key = jax.random.PRNGKey(0)
    variables = _restore(ckpt, model, batch, key, K=1)
    recon = np.asarray(model.apply(variables, batch, K, method="reconstruct",
                                   rngs={"sample": key}))  # [K, B, C, H, W]
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(2, n_show, figsize=(3 * n_show, 6))
    for i in range(n_show):
        axes[0, i].imshow(np.moveaxis(images[i], 0, -1) * 0.5 + 0.5)
        axes[0, i].set_title("input")
        axes[1, i].imshow(np.clip(
            np.moveaxis(recon.mean(0)[i], 0, -1) * 0.5 + 0.5, 0, 1))
        axes[1, i].set_title("reconstruction")
        for ax in (axes[0, i], axes[1, i]):
            ax.axis("off")
    fig.tight_layout()
    path = os.path.join(out_dir, "image_reconstructions.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    mm_ckpt, K, n_show, out_dir = None, 100, 4, "./figs"
    which = "mmvae"
    rest = []
    for a in argv:
        if a.startswith("model="):
            which = a.split("=", 1)[1]
        elif a.startswith("mm_ckpt="):
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

    if which in ("photometry", "spectra"):
        return try_unimodal(which, data_path, mm_ckpt, K, n_show, out_dir)
    if which == "image":
        return try_image(data_path, mm_ckpt, K, n_show, out_dir)

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
