"""Smoke-run every experiment driver on tiny synthetic data.

Usage: python scripts/smoke_experiments.py [fast]
Prints PASS/FAIL per driver; exits nonzero on any failure.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# the env var alone does not stick under the axon TPU plugin — the config
# update is the authoritative override (same pattern as tests/conftest.py)
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

COMMON = ["train.epochs=2", "train.batch_size=8", "train.save_every=2",
          "train.ckpt_dir=/tmp/smoke_ck", "train.log_dir=/tmp/smoke_lg"]

SMALL_MODEL = ["model.model_dim=16", "model.ff_dim=16", "model.num_layers=1",
               "model.num_heads=2", "model.latent_len=2", "model.latent_dim=2"]


def run(name, fn, argv):
    try:
        fn(argv)
        print(f"PASS {name}")
        return True
    except Exception:
        print(f"FAIL {name}")
        traceback.print_exc()
        return False


def main():
    from vaesne_tpu.experiments import (
        eval_goldstein,
        eval_masking,
        eval_regression,
        train_contrastive,
        train_image,
        train_photometry,
        train_photospectra,
        train_regression,
        train_spectra,
        train_ztf_photospect,
        train_ztf_spectra,
        try_models,
    )

    ok = True
    ok &= run("train_photometry", train_photometry.main, COMMON + SMALL_MODEL)
    ok &= run("train_spectra", train_spectra.main, COMMON + SMALL_MODEL)
    ok &= run("train_photospectra", train_photospectra.main,
              COMMON + SMALL_MODEL + ["train.K=2"])
    ok &= run("train_contrastive", train_contrastive.main, COMMON + SMALL_MODEL)
    ok &= run("train_image", train_image.main,
              COMMON + SMALL_MODEL + ["img_size=16", "patch_size=4"])
    ok &= run("train_image_mnist", train_image.main,
              COMMON + SMALL_MODEL + ["dataset=mnist", "img_size=15"])
    ok &= run("train_ztf_spectra", train_ztf_spectra.main, COMMON + SMALL_MODEL)
    ok &= run("train_ztf_photospect", train_ztf_photospect.main,
              COMMON + SMALL_MODEL + ["train.K=2"])
    for backbone in ("mmvae", "contrast", "end2end"):
        for modality in ("photometry", "spec"):
            ok &= run(
                f"train_regression_{modality}_{backbone}",
                train_regression.main,
                COMMON + [f"modality={modality}", f"backbone={backbone}"],
            )
    ok &= run("eval_goldstein", eval_goldstein.main, ["K=8", "out=/tmp/smoke_res"])
    ok &= run("eval_masking", eval_masking.main, ["K=8", "out=/tmp/smoke_res"])
    ok &= run("eval_regression", eval_regression.main,
              ["modality=photometry", "backbone=end2end", "out=/tmp/smoke_res"])
    ok &= run("try_models", try_models.main, ["K=8", "n=2", "out=/tmp/smoke_figs"])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
