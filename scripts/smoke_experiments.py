"""Smoke-run every experiment driver on tiny synthetic data.

Usage: python scripts/smoke_experiments.py [--in-process]
Prints PASS/FAIL per driver; exits nonzero on any failure.

Each driver runs in its OWN subprocess with a timeout (default; the
watchdog pattern from bench.py): a single hung driver — e.g. a PJRT
backend sleep-retrying against a dead TPU tunnel — becomes one FAIL
instead of wedging the whole sweep. ``--in-process`` restores the old
single-process behavior (faster: shared jax init).
"""

import os
import subprocess
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# hard assign, NOT setdefault: the session environment pins JAX_PLATFORMS to
# the TPU plugin, but this sweep is a CPU smoke by design (and must not
# wedge on a dead TPU tunnel)
os.environ["JAX_PLATFORMS"] = "cpu"

COMMON = ["train.epochs=2", "train.batch_size=8", "train.save_every=2",
          "train.ckpt_dir=/tmp/smoke_ck", "train.log_dir=/tmp/smoke_lg"]

SMALL_MODEL = ["model.model_dim=16", "model.ff_dim=16", "model.num_layers=1",
               "model.num_heads=2", "model.latent_len=2", "model.latent_dim=2"]

PER_DRIVER_TIMEOUT = 1800  # seconds; 1-core CPU compiles are slow


def _cases():
    """name -> (module path, argv). Import happens in the child."""
    cases = {
        "train_photometry": ("train_photometry", COMMON + SMALL_MODEL),
        "train_spectra": ("train_spectra", COMMON + SMALL_MODEL),
        "train_photospectra": ("train_photospectra",
                               COMMON + SMALL_MODEL + ["train.K=2"]),
        "train_contrastive": ("train_contrastive", COMMON + SMALL_MODEL),
        "train_image": ("train_image",
                        COMMON + SMALL_MODEL + ["img_size=16", "patch_size=4"]),
        "train_image_mnist": ("train_image",
                              COMMON + SMALL_MODEL + ["dataset=mnist",
                                                      "img_size=15"]),
        # repeat_factor=2 (not the reference's 10): the x10 repeat is an
        # augmentation-epoch multiplier, pure runtime on a 1-core smoke
        "train_ztf_spectra": ("train_ztf_spectra",
                              COMMON + SMALL_MODEL + ["repeat_factor=2"]),
        "train_ztf_photospect": ("train_ztf_photospect",
                                 COMMON + SMALL_MODEL
                                 + ["train.K=2", "repeat_factor=2"]),
        "eval_goldstein": ("eval_goldstein", ["K=8", "out=/tmp/smoke_res"]),
        "eval_masking": ("eval_masking", ["K=8", "out=/tmp/smoke_res"]),
        "eval_regression": ("eval_regression",
                            ["modality=photometry", "backbone=end2end",
                             "out=/tmp/smoke_res"]),
        "try_models": ("try_models", ["K=8", "n=2", "out=/tmp/smoke_figs"]),
    }
    for backbone in ("mmvae", "contrast", "end2end"):
        for modality in ("photometry", "spec"):
            cases[f"train_regression_{modality}_{backbone}"] = (
                "train_regression",
                COMMON + [f"modality={modality}", f"backbone={backbone}"],
            )
    return cases


def _run_one(module, argv):
    import importlib

    import jax

    # the env var alone does not stick under the axon TPU plugin — the
    # config update is the authoritative override (tests/conftest.py)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    mod = importlib.import_module(f"vaesne_tpu.experiments.{module}")
    mod.main(argv)


def main():
    cases = _cases()
    in_process = "--in-process" in sys.argv
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    ok = True
    for name, (module, argv) in cases.items():
        if only and name not in only:
            continue
        if in_process:
            try:
                _run_one(module, argv)
                print(f"PASS {name}")
            except Exception:
                print(f"FAIL {name}")
                traceback.print_exc()
                ok = False
            continue
        env = dict(os.environ, VAESNE_SMOKE_CHILD=f"{module}\x1f" +
                   "\x1f".join(argv))
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=PER_DRIVER_TIMEOUT)
        except subprocess.TimeoutExpired:
            print(f"FAIL {name} (timeout {PER_DRIVER_TIMEOUT}s)")
            ok = False
            continue
        if r.returncode == 0:
            print(f"PASS {name}")
        else:
            print(f"FAIL {name}\n{r.stderr[-1500:]}")
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if os.environ.get("VAESNE_SMOKE_CHILD"):
        module, *argv = os.environ["VAESNE_SMOKE_CHILD"].split("\x1f")
        _run_one(module, argv)
    else:
        main()
