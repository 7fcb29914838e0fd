"""A/B: scan-epoch vs per-step dispatch at the REFERENCE batch size.

VERDICT r2 #8: the `scan_epoch=True` default (one lax.scan program per
epoch, experiments/common.py) was justified by dispatch-overhead reasoning
but never measured on TPU. This times one full epoch of the flagship
config (Goldstein photo+spectra MMVAE, m-IWAE K=2, batch 16 —
test_photospectra.py:93-144) both ways on a synthetic contract-shaped
dataset, with the forced-sync protocol (BASELINE.md "Measurement
honesty": read a value data-dependent on the whole chain).

Each arm runs in a fresh subprocess to isolate jit caches.

Run on the TPU: python scripts/ab_scan_epoch.py [n=512] [batch=16]
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(next((a.split("=", 1)[1] for a in sys.argv[1:]
              if a.startswith("n=")), "512"))
BATCH = int(next((a.split("=", 1)[1] for a in sys.argv[1:]
                  if a.startswith("batch=")), "16"))


def _child():
    os.environ.setdefault("VAESNE_BF16", "1")
    os.environ.setdefault("VAESNE_REMAT", "0")
    scan = os.environ["VAESNE_AB_SCAN"] == "1"
    import jax

    from vaesne_tpu import objectives
    from vaesne_tpu.data import make_goldstein_like, multimodal_tuple
    from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE
    from vaesne_tpu.training import (TrainState, adamw, init_model,
                                     make_scan_epoch, make_train_step,
                                     train_epoch)

    data = multimodal_tuple(make_goldstein_like(n=N, seed=0))
    model = PhotoSpecMMVAE(
        vaes=[
            PhotometricVAE(num_bands=6, latent_len=4, latent_dim=4,
                           model_dim=32, ff_dim=32),
            SpectraVAE(latent_len=4, latent_dim=4, model_dim=32, ff_dim=32),
        ],
        beta=1.0,
    )
    params = init_model(model, data, jax.random.PRNGKey(0), K=2)
    opt = adamw(1e-4)

    def loss_fn(m, v, b, k):
        return objectives.m_iwae(m, v, b, K=2, key=k, deterministic=False)

    def fresh_state():
        return TrainState.create(
            init_model(model, data, jax.random.PRNGKey(0), K=2), opt,
            jax.random.PRNGKey(0))

    if scan:
        epoch_fn = make_scan_epoch(model, opt, loss_fn)

        def run_epoch(state, key):
            return epoch_fn(state, data, key, BATCH)
    else:
        step = make_train_step(model, opt, loss_fn)

        def run_epoch(state, key):
            return train_epoch(state, step, data, BATCH, key)

    state = fresh_state()
    key = jax.random.PRNGKey(7)
    state, loss = run_epoch(state, key)  # compile + warm
    float(loss)
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        state, loss = run_epoch(state, jax.random.fold_in(key, r))
        float(loss)  # forced sync
        best = min(best, time.perf_counter() - t0)
    steps = N // BATCH
    print(json.dumps({
        "epoch_ms": round(best * 1e3, 1),
        "ms_per_step": round(best * 1e3 / steps, 2),
        "samples_per_sec": round(N / best, 1),
    }))


def main():
    results = {}
    for label, scan in (("scan_epoch", "1"), ("per_step", "0")):
        env = dict(os.environ, VAESNE_AB_SCAN=scan)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                env=env, capture_output=True, text=True, timeout=1200,
            )
        except subprocess.TimeoutExpired:
            results[label] = {"error": "timeout"}
            continue
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode == 0 and lines:
            results[label] = json.loads(lines[-1])
        else:
            results[label] = {"error": out.stderr[-300:]}
        print(f"{label}: {results[label]}", file=sys.stderr)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    if os.environ.get("VAESNE_AB_SCAN"):
        _child()
    else:
        main()
