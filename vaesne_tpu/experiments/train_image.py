"""Train the host-galaxy image VAE (ZTF postage stamps or MNIST smoke test).

Reference: cannon/test_ZTFimage.py (60x60 RGB, patch 2, hybrid decoder,
ImagePathDatasetAug x5 at :27,54-70) and cannon/mnist.py (60x60 resize, 1
channel, patch 3, latent 4x4, beta 0.1, lr 1e-3 — the reference's only
smoke test, SURVEY §4).

``dataset=mnist`` uses torchvision MNIST when available locally (no
download in this environment) and otherwise a synthetic digit-like fallback;
``dataset=synthetic`` (default) uses the galaxy-image generator;
``data=/dir`` loads images from a directory of files via
``ImagePathDataset``.

Usage: python -m vaesne_tpu.experiments.train_image [dataset=mnist] [k=v ...]
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .. import objectives
from ..data import augment_images, make_images
from ..models import HostImgVAE
from ..utils.config import ImageVAEConfig, parse_overrides
from .common import parse_cli, train_loop


def load_mnist_like(n: int = 512, img_size: int = 60, seed: int = 0,
                    require_real: bool = False, root: str = "./data_mnist"):
    """MNIST via torchvision if a local copy exists (no network egress here);
    otherwise synthetic digit-ish blobs with the same shape contract
    [N, 1, 60, 60] in [-1, 1].

    ``require_real=True`` (or env ``VAESNE_REQUIRE_REAL_MNIST=1``) turns the
    silent synthetic fallback into a hard error — so the reference's one
    end-to-end sanity config (mnist.py:13-45) provably runs on the ACTUAL
    digits whenever a local copy + torchvision exist (it is CI-skip-guarded
    in tests/test_drivers.py and documented in README "Data")."""
    require_real = require_real or os.environ.get(
        "VAESNE_REQUIRE_REAL_MNIST") == "1"
    try:
        from torchvision import datasets, transforms  # noqa: PLC0415

        tfm = transforms.Compose(
            [transforms.Resize((img_size, img_size)), transforms.ToTensor()]
        )
        ds = datasets.MNIST(root, train=True, download=False, transform=tfm)
        imgs = np.stack([np.asarray(ds[i][0]) for i in range(min(n, len(ds)))])
        return (imgs * 2.0 - 1.0).astype(np.float32)
    except Exception:
        if require_real:
            raise
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:img_size, 0:img_size]
        imgs = np.zeros((n, 1, img_size, img_size), np.float32)
        for i in range(n):
            # stroke-like arcs: a rotated ellipse ring per "digit"
            cx, cy = rng.uniform(0.35, 0.65, 2) * img_size
            rx, ry = rng.uniform(8, 20, 2)
            th = rng.uniform(0, np.pi)
            xr = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
            yr = -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)
            r = np.sqrt((xr / rx) ** 2 + (yr / ry) ** 2)
            imgs[i, 0] = np.exp(-0.5 * ((r - 1.0) / 0.15) ** 2)
        return np.clip(imgs * 2.0 - 1.0, -1.0, 1.0).astype(np.float32)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    dataset = "synthetic"
    rest = []
    for a in argv:
        if a.startswith("dataset="):
            dataset = a.split("=", 1)[1]
        else:
            rest.append(a)
    data_path, rest = parse_cli(rest)
    cfg = ImageVAEConfig()
    if dataset == "mnist":
        # the reference MNIST smoke config (mnist.py:21-45); user overrides
        # in ``rest`` still win
        cfg = parse_overrides(
            cfg, ["in_channels=1", "patch_size=3", "train.beta=0.1",
                  "train.lr=1e-3", "train.epochs=50"]
        )
    cfg = parse_overrides(cfg, rest)

    if dataset == "mnist":
        images = load_mnist_like(img_size=cfg.img_size, seed=cfg.train.seed)
    elif data_path:
        from ..data.images import ImagePathDataset  # noqa: PLC0415

        images = ImagePathDataset.from_dir(data_path, img_size=cfg.img_size).load_all()
    else:
        images = make_images(n=512, img_size=cfg.img_size,
                             channels=cfg.in_channels, seed=cfg.train.seed)

    # model input contract: (image NCHW, event_loc placeholder)
    train_data = (jnp.asarray(images), jnp.zeros((images.shape[0], 0), jnp.float32))

    m = cfg.model
    model = HostImgVAE(
        img_size=cfg.img_size, patch_size=cfg.patch_size,
        in_channels=cfg.in_channels, hybrid=cfg.hybrid, focal_loc=cfg.focal_loc,
        latent_len=m.latent_len, latent_dim=m.latent_dim, model_dim=m.model_dim,
        num_heads=m.num_heads, ff_dim=m.ff_dim, num_layers=m.num_layers,
        dropout=m.dropout, selfattn=m.selfattn, beta=cfg.train.beta,
    )

    def loss_fn(mod, variables, batch, key):
        return objectives.elbo(mod, variables, batch, K=cfg.train.K, key=key,
                               deterministic=False)

    def augment(key, batch):
        # the on-device analog of ImagePathDatasetAug's flip/affine x factor
        # (data_util.py:47-73): fresh flips/shifts every epoch
        return (augment_images(key, batch[0]), batch[1])

    state, losses = train_loop(
        model, train_data, loss_fn, cfg.train, config=cfg,
        augment_fn=augment,
        ckpt_name=f"{dataset}_image_{m.latent_len}-{m.latent_dim}_patch{cfg.patch_size}",
    )
    print(f"final loss: {losses[-1]:.6f}")
    return state, losses


if __name__ == "__main__":
    main()
