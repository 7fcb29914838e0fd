"""Throughput sweep over batch size / kernel knobs (perf tuning harness).

Runs the same fused m-IWAE train step as bench.py at several global batch
sizes and prints samples/sec for each — used to pick bench.py's operating
point on real hardware. Not part of the driver contract.
"""

import argparse
import os
import time

os.environ.setdefault("VAESNE_BF16", "1")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

import bench


def run_point(B, warmup=2, steps=10, windows=3):
    from vaesne_tpu import objectives
    from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE
    from vaesne_tpu.training import TrainState, adamw, init_model, make_train_step

    model = PhotoSpecMMVAE(
        vaes=[
            PhotometricVAE(num_bands=6, latent_len=4, latent_dim=4,
                           model_dim=32, ff_dim=32),
            SpectraVAE(latent_len=4, latent_dim=4, model_dim=32, ff_dim=32),
        ],
        beta=1.0,
    )
    batch = bench.make_batch(B)
    key = jax.random.PRNGKey(0)
    params = init_model(model, batch, key, K=bench.K)
    opt = adamw(1e-4)
    state = TrainState.create(params, opt, key)

    def loss_fn(m, variables, b, k):
        return objectives.m_iwae(m, variables, b, K=bench.K, key=k,
                                 deterministic=False)

    step = make_train_step(model, opt, loss_fn)
    for _ in range(warmup):
        state, loss = step(state, batch)
    float(loss)  # honest sync (block_until_ready lies on axon; BASELINE.md)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = step(state, batch)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    return steps * B / best


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[512, 1024, 2048, 4096])
    args = ap.parse_args()
    for B in args.batches:
        try:
            sps = run_point(B)
            print(f"B={B:5d}  {sps:12.1f} samples/sec", flush=True)
        except Exception as e:  # OOM etc.
            print(f"B={B:5d}  FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
