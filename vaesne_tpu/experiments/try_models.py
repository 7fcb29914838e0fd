"""Qualitative evaluation: reconstruction / cross-modal / generation figures.

Reference: cannon/try_photometry_model.py, try_spectra_model.py,
try_photospectra_model.py, try_img_model.py (load pickled model, K=100
posterior samples, matplotlib CI-band figures; cross matrix convention
``[0][0]`` LC→LC, ``[0][1]`` LC→spec, ... documented at
try_photospectra_model.py:78).

Usage:
ZTF variants (try_ZTF_spectonly.py / try_ZTF_photospect.py): pass
``model=ztf_spectra`` or ``model=ztf_mmvae`` with the matching checkpoint
(e.g. the shipped ``artifacts/ckpt/ztf_*``); bands/normalization come from
the ZTF data keys and the checkpoint's config.json.

Usage:
  python -m vaesne_tpu.experiments.try_models \
      [model=mmvae|photometry|spectra|image|ztf_spectra|ztf_mmvae|latent_swap]
      [data=...] [mm_ckpt=...] [photo_ckpt=...] [spec_ckpt=...]
      [K=100] [n=4] [out=./figs]

``model=latent_swap`` reproduces the unimodal-VAE latent-swap cross-decode
experiment (try_photospectra_model.py:82-85): pass ``photo_ckpt=`` and
``spec_ckpt=`` pointing at unimodal checkpoints with matching latent shapes
(e.g. the shipped ``artifacts/ckpt/goldstein_{photometry,spectra}_4-4``).
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
from .eval_goldstein import _config_for, _restore
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
        cfg = _config_for(ckpt, PhotometryVAEConfig)
        model = build_photo(cfg)
    else:
        batch = spectra_tuple(data, idx=te_idx)
        cfg = _config_for(ckpt, SpectraVAEConfig)
        model = build_spec(cfg)
    key = jax.random.PRNGKey(0)
    variables = _restore(ckpt, model, batch, key, K=1, train_cfg=cfg.train)
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

    cfg = _config_for(ckpt, ImageVAEConfig)
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
    variables = _restore(ckpt, model, batch, key, K=1, train_cfg=cfg.train)
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


def try_ztf_spectra(data_path, ckpt, K, n_show, out_dir):
    """ZTF spectra-only qualitative eval (try_ZTF_spectonly.py): posterior
    reconstruction with a 95% CI band on the observed wavelengths in physical
    units, plus prior-sample spectra — against the shipped
    ``artifacts/ckpt/ztf_spectra_*`` checkpoints (or any ckpt=...)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils.config import ZTFSpectraConfig
    from .train_ztf_spectra import build_model as build_ztf_spec

    data = resolve_dataset(data_path, "ztf")
    te_idx = np.asarray(data["testing_idx"])[:max(n_show, 1)]
    batch = spectra_tuple(data, idx=te_idx)
    cfg = _config_for(ckpt, ZTFSpectraConfig)
    model = build_ztf_spec(cfg)
    key = jax.random.PRNGKey(0)
    variables = _restore(ckpt, model, batch, key, K=1, train_cfg=cfg.train)

    wl_m, wl_s = float(data["wavelength_mean"]), float(data["wavelength_std"])
    fl_m, fl_s = float(data["flux_mean"]), float(data["flux_std"])

    recon = np.asarray(model.apply(variables, batch, K, method="reconstruct",
                                   rngs={"sample": key}))  # [K, B, bins]
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(1, len(te_idx), figsize=(5 * len(te_idx), 4),
                             squeeze=False)
    for i, ax in enumerate(axes[0]):
        obs = ~np.asarray(batch[3][i])  # True == observed
        wl = np.asarray(batch[1][i])[obs] * wl_s + wl_m
        ax.plot(wl, np.asarray(batch[0][i])[obs] * fl_s + fl_m,
                color="red", label="ground truth")
        rec = recon[:, i][:, obs] * fl_s + fl_m
        ax.plot(wl, rec.mean(0), color="blue", label="Rec-spec")
        ax.fill_between(wl, np.quantile(rec, 0.025, axis=0),
                        np.quantile(rec, 0.975, axis=0), color="blue",
                        alpha=0.3)
        ax.set_xlabel("wavelength (Å)")
        ax.set_ylabel("log Fnu")
        ax.legend()
    fig.tight_layout()
    path = os.path.join(out_dir, "ztf_spectra_reconstruction.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")

    N = 30
    gens = np.asarray(model.apply(variables, N, batch, method="generate",
                                  rngs={"sample": key}))  # [N, B, bins]
    fig, axs = plt.subplots(2, 1, figsize=(10, 5))
    obs0 = ~np.asarray(batch[3][0])
    wl0 = np.asarray(batch[1][0])[obs0] * wl_s + wl_m
    for i in range(min(N, len(te_idx))):
        obs = ~np.asarray(batch[3][i])
        axs[0].plot(np.asarray(batch[1][i])[obs] * wl_s + wl_m,
                    np.asarray(batch[0][i])[obs] * fl_s + fl_m, alpha=0.5)
    for i in range(N):
        axs[1].plot(wl0, gens[i, 0][obs0] * fl_s + fl_m, alpha=0.5)
    axs[0].set_title("ground-truth spectra")
    axs[1].set_title("prior samples")
    for ax in axs:
        ax.set_ylabel("log Fnu")
        ax.set_xlabel("wavelength (Å)")
        ax.set_ylim(-2 * fl_s + fl_m, 2 * fl_s + fl_m)
    fig.tight_layout()
    path = os.path.join(out_dir, "ztf_spectra_priorsamples.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")


def try_ztf_mmvae(data_path, ckpt, K, n_show, out_dir):
    """ZTF photo+spectra MMVAE qualitative eval (try_ZTF_photospect.py):
    per-band light-curve panels (ground truth / self-recon / spec→LC), the
    spec→spec and LC→spec CI-band figures, and prior samples — in physical
    units via the ZTF normalization keys (combined_*/spectime_*,
    try_ZTF_photospect.py:21-31)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils.config import ZTFMMVAEConfig
    from .train_ztf_photospect import build_model as build_ztf_mm

    data = resolve_dataset(data_path, "ztf")
    te_idx = np.asarray(data["testing_idx"])[:max(n_show, 1)]
    batch = multimodal_tuple(data, idx=te_idx)
    cfg = _config_for(ckpt, ZTFMMVAEConfig)
    model = build_ztf_mm(cfg)
    key = jax.random.PRNGKey(0)
    variables = _restore(ckpt, model, batch, key, K=1, train_cfg=cfg.train)

    wl_m, wl_s = float(data["wavelength_mean"]), float(data["wavelength_std"])
    fl_m, fl_s = float(data["flux_mean"]), float(data["flux_std"])
    pf_m, pf_s = float(data["combined_mean"]), float(data["combined_std"])
    pt_m, pt_s = (float(data["combined_time_mean"]),
                  float(data["combined_time_std"]))

    recons = model.apply(variables, batch, K, method="reconstruct",
                         rngs={"sample": key})
    photo, spec = batch
    os.makedirs(out_dir, exist_ok=True)

    # --- light curves: ground truth / LC→LC / spec→LC, per band ---------
    i = 0
    fig, axs = plt.subplots(1, 3, figsize=(12, 5))
    band = np.asarray(photo[2][i])
    pobs = ~np.asarray(photo[3][i])
    lc_rec = np.asarray(recons[0][0])[:, i].mean(0)  # [60]
    lc_cross = np.asarray(recons[1][0])[:, i].mean(0)
    for b in range(cfg.num_bands):
        sel = (band == b) & pobs
        t = np.asarray(photo[1][i])[sel] * pt_s + pt_m
        for ax, series, marker in ((axs[0], np.asarray(photo[0][i]), "o"),
                                   (axs[1], lc_rec, "x"),
                                   (axs[2], lc_cross, "x")):
            v = series[sel] * pf_s + pf_m
            ax.plot(t, v)
            ax.scatter(t, v, s=20, marker=marker)
    ylow, yhigh = -2 * pf_s + pf_m, 6 * pf_s + pf_m
    for ax, title in zip(axs, ("Ground truth", "Reconstruction-LC",
                               "Reconstruction-Spectra")):
        ax.set_ylim(ylow, yhigh)
        ax.invert_yaxis()
        ax.set_title(title)
    axs[0].set_ylabel("AbsMag")
    axs[1].set_xlabel("days")
    path = os.path.join(out_dir, "ztf_lc_reconstruction.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")

    # --- spectra: spec→spec and LC→spec with CI bands -------------------
    sobs = ~np.asarray(spec[3][i])
    wl = np.asarray(spec[1][i])[sobs] * wl_s + wl_m
    gt = np.asarray(spec[0][i])[sobs] * fl_s + fl_m
    fig, axs = plt.subplots(2, 1, figsize=(10, 8))
    for ax, (e, color, label) in zip(
            axs, ((1, "blue", "Rec-spec"), (0, "green", "Rec-LC"))):
        rec = np.asarray(recons[e][1])[:, i][:, sobs] * fl_s + fl_m
        ax.plot(wl, gt, color="red",
                label="ground truth" if e == 1 else None)
        ax.plot(wl, rec.mean(0), color=color, label=label)
        ax.fill_between(wl, np.quantile(rec, 0.05, axis=0),
                        np.quantile(rec, 0.95, axis=0), color=color,
                        alpha=0.3)
        if e == 0:  # LC→spec: individual posterior-sample traces
            for k in range(min(30, rec.shape[0])):
                ax.plot(wl, rec[k], alpha=0.3)
        ax.set_ylabel("log Fnu")
        ax.legend()
    axs[1].set_xlabel("wavelength (Å)")
    fig.tight_layout()
    path = os.path.join(out_dir, "ztf_spectra_reconstruction.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")

    # --- prior samples --------------------------------------------------
    N = 30
    gens = model.apply(variables, N, batch, method="generate",
                       rngs={"sample": key})
    fig, axs = plt.subplots(2, 1, figsize=(8, 6))
    for j in range(min(N, len(te_idx))):
        o = ~np.asarray(spec[3][j])
        axs[0].plot(np.asarray(spec[1][j])[o] * wl_s + wl_m,
                    np.asarray(spec[0][j])[o] * fl_s + fl_m, alpha=0.5)
    for j in range(N):
        axs[1].plot(wl, np.asarray(gens[1])[j, i][sobs] * fl_s + fl_m,
                    alpha=0.5)
    axs[0].set_title("ground-truth spectra")
    axs[1].set_title("prior samples")
    for ax in axs:
        ax.set_ylabel("log Fnu")
        ax.set_xlabel("wavelength (Å)")
        ax.set_ylim(-2 * fl_s + fl_m, 2 * fl_s + fl_m)
    fig.tight_layout()
    path = os.path.join(out_dir, "ztf_spectra_priorsamples.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")


def try_latent_swap(data_path, photo_ckpt, spec_ckpt, K, n_show, out_dir):
    """Unimodal-VAE latent-swap cross-decode (try_photospectra_model.py:82-85):
    encode each modality with its own UNIMODAL VAE (posterior mean), swap the
    latents, and decode — LC latents through the spectra decoder and spectra
    latents through the LC decoder. Unlike the MMVAE cross matrix, the two
    VAEs here were never trained together; the figure shows how far the
    independently-learned latent spaces happen to align."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils.config import PhotometryVAEConfig, SpectraVAEConfig
    from .train_photometry import build_model as build_photo
    from .train_spectra import build_model as build_spec

    if not photo_ckpt or not spec_ckpt:
        # without checkpoints _restore would silently run the experiment on
        # freshly-initialized weights and save a meaningless figure
        raise ValueError(
            "model=latent_swap needs trained unimodal checkpoints: pass "
            "photo_ckpt=<path> spec_ckpt=<path> (e.g. the shipped "
            "artifacts/ckpt/goldstein_{photometry,spectra}_4-4)"
        )

    data = resolve_dataset(data_path, "goldstein")
    te_idx = np.asarray(data["testing_idx"])[:n_show]
    photo = photometry_tuple(data, idx=te_idx)
    spec = spectra_tuple(data, idx=te_idx)
    key = jax.random.PRNGKey(0)

    pcfg = _config_for(photo_ckpt, PhotometryVAEConfig)
    scfg = _config_for(spec_ckpt, SpectraVAEConfig)
    if (pcfg.model.latent_len, pcfg.model.latent_dim) != (
            scfg.model.latent_len, scfg.model.latent_dim):
        raise ValueError(
            "latent_swap needs matching latent shapes: photometry ckpt has "
            f"{pcfg.model.latent_len}x{pcfg.model.latent_dim}, spectra ckpt "
            f"{scfg.model.latent_len}x{scfg.model.latent_dim}")
    photo_model = build_photo(pcfg)
    spec_model = build_spec(scfg)
    photo_vars = _restore(photo_ckpt, photo_model, photo, key, K=1,
                          train_cfg=pcfg.train)
    spec_vars = _restore(spec_ckpt, spec_model, spec, key, K=1,
                         train_cfg=scfg.train)

    # posterior means [B, latent_len, latent_dim] → add the K=1 axis the
    # decoders expect (reference's `[None, ...]`, try_photospectra_model.py:83)
    z_photo = photo_model.apply(photo_vars, photo, method="encode")[None]
    z_spec = spec_model.apply(spec_vars, spec, method="encode")[None]
    # the swap: each decoder driven by the OTHER modality's latents
    lc2spec = np.asarray(
        spec_model.apply(spec_vars, z_photo, spec, method="decode").mean[0])
    spec2lc = np.asarray(
        photo_model.apply(photo_vars, z_spec, photo, method="decode").mean[0])

    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(n_show, 2, figsize=(10, 3.2 * n_show))
    axes = np.atleast_2d(axes)
    for i in range(n_show):
        ax = axes[i, 0]
        plot_lsst_lc(np.asarray(photo[2][i]), spec2lc[i],
                     np.asarray(photo[1][i]), np.asarray(photo[3][i]), ax=ax)
        plot_lsst_lc(np.asarray(photo[2][i]), np.asarray(photo[0][i]),
                     np.asarray(photo[1][i]), np.asarray(photo[3][i]),
                     ax=ax, alpha=0.3)
        ax.set_title("spec latents → LC decoder")
        ax = axes[i, 1]
        obs = ~np.asarray(spec[3][i])
        ax.plot(np.asarray(spec[1][i])[obs], np.asarray(spec[0][i])[obs],
                color="k", lw=0.5, alpha=0.5, label="ground truth")
        ax.plot(np.asarray(spec[1][i])[obs], lc2spec[i][obs],
                color="tab:blue", label="LC latents → spec decoder")
        ax.set_title("LC latents → spectra decoder")
        if i == 0:
            ax.legend()
    fig.tight_layout()
    path = os.path.join(out_dir, "latent_swap.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    mm_ckpt, K, n_show, out_dir = None, 100, 4, "./figs"
    photo_ckpt = spec_ckpt = None
    which = "mmvae"
    rest = []
    for a in argv:
        if a.startswith("model="):
            which = a.split("=", 1)[1]
        elif a.startswith("mm_ckpt="):
            mm_ckpt = a.split("=", 1)[1]
        elif a.startswith("photo_ckpt="):
            photo_ckpt = a.split("=", 1)[1]
        elif a.startswith("spec_ckpt="):
            spec_ckpt = a.split("=", 1)[1]
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
    if which == "ztf_spectra":
        return try_ztf_spectra(data_path, mm_ckpt, K, n_show, out_dir)
    if which == "ztf_mmvae":
        return try_ztf_mmvae(data_path, mm_ckpt, K, n_show, out_dir)
    if which == "latent_swap":
        return try_latent_swap(data_path, photo_ckpt, spec_ckpt, K, n_show,
                               out_dir)

    data = resolve_dataset(data_path, "goldstein")
    te_idx = np.asarray(data["testing_idx"])[:n_show]
    batch = multimodal_tuple(data, idx=te_idx)
    key = jax.random.PRNGKey(0)

    cfg = _config_for(mm_ckpt, PhotoSpectraMMVAEConfig)
    model = build_mmvae(cfg)
    variables = _restore(mm_ckpt, model, batch, key, K=1, train_cfg=cfg.train)

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
