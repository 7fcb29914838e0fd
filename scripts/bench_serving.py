"""Measure InferenceServer online cross-modal latency on the real chip.

The offline number (BASELINE.md "Cross-modal generation") is one jitted
LC→spectrum program at K=100, batch 64. This measures the SERVING path on
top of it: bucket padding + cached-program dispatch + CI-band reduction,
at request sizes that do NOT equal the bucket (the realistic online case),
with the forced-sync protocol (utils/profiling.honest_sync).

Usage (on TPU):  python scripts/bench_serving.py [K] [bucket]
Prints one JSON line per measured case.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "VAESNE_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".xla_cache"),
)

import numpy as np  # noqa: E402
import jax  # noqa: E402

from vaesne_tpu.models import (  # noqa: E402
    PhotometricVAE, PhotoSpecMMVAE, SpectraVAE,
)
from vaesne_tpu.serving import InferenceServer  # noqa: E402
from vaesne_tpu.utils.profiling import honest_sync  # noqa: E402

LP, NS = 60, 982


def request(n, seed=0):
    rng = np.random.default_rng(seed)
    photo = (
        rng.normal(size=(n, LP)).astype(np.float32),
        np.sort(rng.uniform(-1, 1, (n, LP)), axis=1).astype(np.float32),
        rng.integers(0, 6, (n, LP)).astype(np.int32),
        rng.uniform(size=(n, LP)) < 0.2,
    )
    spec = (
        rng.normal(size=(n, NS)).astype(np.float32),
        np.linspace(-1, 1, NS, dtype=np.float32)[None].repeat(n, 0),
        rng.normal(size=(n,)).astype(np.float32),
        rng.uniform(size=(n, NS)) < 0.2,
    )
    return photo, spec


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if bucket < 8:
        # the timed request ladder below goes down to 7 events; a smaller
        # bucket would make the 7-event request overflow the bucket ladder
        sys.exit(f"bucket must be >= 8, got {bucket}")
    model = PhotoSpecMMVAE(
        vaes=[
            PhotometricVAE(num_bands=6, latent_len=4, latent_dim=4,
                           model_dim=32, ff_dim=32),
            SpectraVAE(latent_len=4, latent_dim=4, model_dim=32, ff_dim=32),
        ],
        beta=1.0,
    )

    @jax.jit
    def _init(b):
        key = jax.random.PRNGKey(0)
        return model.init({"params": key, "sample": key}, b, 1)

    variables = _init(jax.device_put(request(2)))
    server = InferenceServer(model, variables, buckets=(bucket,), seed=0)

    for task, call in (
        ("crossmodal", lambda p, s, k: server.crossmodal(p, s, K=K, key=k)),
        ("crossmodal_ci",
         lambda p, s, k: server.crossmodal_ci(p, s, K=K, key=k)),
    ):
        # warmup (compile) on one size, then time OTHER sizes in the same
        # bucket — every timed call is pad + cached dispatch, zero compiles
        photo, spec = request(max(1, bucket - 11), seed=1)
        honest_sync(call(photo, spec, jax.random.PRNGKey(0)))
        compiles_before = server.compiles
        times = []
        for i, n in enumerate((7, bucket // 2, bucket - 1, bucket)):
            p, s = request(n, seed=2 + i)
            p, s = jax.device_put((p, s))
            t0 = time.perf_counter()
            honest_sync(call(p, s, jax.random.PRNGKey(i)))
            times.append((n, time.perf_counter() - t0))
        assert server.compiles == compiles_before, "timed call recompiled"
        for n, dt in times:
            print(json.dumps({
                "metric": f"serving_{task}_latency", "task": task,
                "request_events": n, "bucket": bucket, "K": K,
                "value": round(dt * 1e3, 1), "unit": "ms",
                "events_per_sec": round(n / dt, 1),
            }))


if __name__ == "__main__":
    main()
