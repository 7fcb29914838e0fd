"""Capture an ON-DEVICE profiler trace of the exact bench window.

VERDICT r4 #1: the per-region attribution in PERFORMANCE.md was built from
microbenchmarks at the step's shapes; this script replaces it with a real
``jax.profiler.trace`` (xplane) capture of the identical compiled
``lax.scan`` window ``bench.py`` times, then reduces the xplane to a
per-op device-time table with ``scripts/analyze_trace.py``.

Usage (on the TPU):
    python scripts/capture_trace.py [logdir=artifacts/xprof]

The capture runs the warmed window ONCE under the profiler (10 train steps,
B=192, bf16 by default — identical program cache key to bench.py's timed
window).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("VAESNE_BF16", "1")
os.environ.setdefault("VAESNE_REMAT", "0")
os.environ.setdefault(
    "VAESNE_COMPILE_CACHE",
    str(Path(__file__).resolve().parent.parent / ".xla_cache"),
)

import functools
import time

import numpy as np

import jax

import bench  # the driver bench: reuse its batch builder + constants


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "artifacts/xprof"
    from vaesne_tpu import objectives
    from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE
    from vaesne_tpu.training import TrainState, adamw, make_train_step

    model = PhotoSpecMMVAE(
        vaes=[
            PhotometricVAE(num_bands=6, latent_len=4, latent_dim=4,
                           model_dim=32, ff_dim=32),
            SpectraVAE(latent_len=4, latent_dim=4, model_dim=32, ff_dim=32),
        ],
        beta=1.0,
    )
    batch = jax.device_put(bench.make_batch(bench.B))
    opt = adamw(1e-4)

    @jax.jit
    def _setup(b):
        root = jax.random.PRNGKey(0)
        k_param, k_sample = jax.random.split(root)
        params = model.init({"params": k_param, "sample": k_sample},
                            b, bench.K)["params"]
        return TrainState.create(params, opt, root)

    state = _setup(batch)

    def loss_fn(m, variables, b, k):
        return objectives.m_iwae(m, variables, b, K=bench.K, key=k,
                                 deterministic=False)

    raw_step = make_train_step(model, opt, loss_fn, jit=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def window(state, b):
        def body(s, _):
            s, loss = raw_step(s, b)
            return s, loss
        state, losses = jax.lax.scan(body, state, None,
                                     length=bench.TIMED_STEPS)
        return state, losses[-1]

    # warm: compile + one full window, forced sync (tunnel rule: read the
    # value, block_until_ready returns early on this backend)
    state, loss = window(state, batch)
    float(loss)
    t0 = time.perf_counter()
    state, loss = window(state, batch)
    float(loss)
    wall = time.perf_counter() - t0
    sps = bench.TIMED_STEPS * bench.B / wall
    print(f"unprofiled window: {wall*1e3:.1f} ms "
          f"({sps:.1f} samples/sec) at B={bench.B}")

    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        state, loss = window(state, batch)
        float(loss)
    print(f"trace written under {logdir}")
    for p in sorted(Path(logdir).rglob("*.xplane.pb")):
        print("  ", p, f"{p.stat().st_size/1e6:.1f} MB")


if __name__ == "__main__":
    main()
