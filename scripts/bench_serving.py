"""Measure InferenceServer online cross-modal latency on the real chip.

The offline number (BASELINE.md "Cross-modal generation") is one jitted
LC→spectrum program at K=100, batch 64. This measures the SERVING path on
top of it: bucket padding + cached-program dispatch + CI-band reduction,
at request sizes that do NOT equal the bucket (the realistic online case),
with the forced-sync protocol (utils/profiling.honest_sync).

Round-5 additions (VERDICT r4 #4):
  * N-thread closed-loop concurrent throughput (requests/sec +
    events/sec) over mixed request sizes — the number that substantiates
    the thread-safety machinery; VAESNE_SERVE_THREADS overrides N=4.
  * bf16 serving leg: a second server with ``precision="bf16"`` measured
    on the same ladder, plus the accuracy delta of its decoded means vs
    the fp32 server on identical inputs/keys.

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

    # Trained weights when the shipped flagship checkpoint is present (the
    # bf16-vs-fp32 ACCURACY delta is only meaningful on a trained decoder;
    # random-init outputs amplify rounding), random init otherwise.
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "ckpt",
        "goldstein_photospec_4-4_K2_beta1.0")
    if os.path.isdir(ckpt):
        server = InferenceServer.from_checkpoint(ckpt, buckets=(bucket,),
                                                 seed=0)
        model, variables = server._model, server._variables
        print(json.dumps({"weights": "trained", "ckpt": ckpt}), flush=True)
    else:
        @jax.jit
        def _init(b):
            key = jax.random.PRNGKey(0)
            return model.init({"params": key, "sample": key}, b, 1)

        variables = _init(jax.device_put(request(2)))
        server = InferenceServer(model, variables, buckets=(bucket,), seed=0)
        print(json.dumps({"weights": "random-init"}), flush=True)

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
            }), flush=True)

    # ---- N-thread closed-loop concurrent throughput ----------------------
    import threading

    n_threads = int(os.environ.get("VAESNE_SERVE_THREADS", "4"))
    reqs_per_thread = 6
    sizes = (7, bucket // 2, bucket - 1, bucket)
    reqs = [jax.device_put(request(sizes[i % len(sizes)], seed=50 + i))
            for i in range(n_threads * reqs_per_thread)]
    errors = []

    def worker(tid):
        try:
            for r in range(reqs_per_thread):
                p, s = reqs[tid * reqs_per_thread + r]
                honest_sync(server.crossmodal(p, s, K=K))
        except Exception as e:  # surfaced below — a thread must not die silently
            errors.append((tid, repr(e)))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    assert not errors, errors
    n_reqs = n_threads * reqs_per_thread
    n_events = sum(sizes[i % len(sizes)] for i in range(n_reqs))
    print(json.dumps({
        "metric": "serving_concurrent_throughput", "threads": n_threads,
        "requests": n_reqs, "K": K, "bucket": bucket,
        "value": round(n_reqs / wall, 2), "unit": "requests/sec",
        "events_per_sec": round(n_events / wall, 1),
        "wall_s": round(wall, 2),
    }), flush=True)

    # ---- bf16 serving leg ------------------------------------------------
    srv16 = InferenceServer(model, variables, buckets=(bucket,), seed=0,
                            precision="bf16")
    photo, spec = request(bucket, seed=99)
    photo, spec = jax.device_put((photo, spec))
    key = jax.random.PRNGKey(7)
    honest_sync(srv16.crossmodal(photo, spec, K=K, key=key))  # compile
    t0 = time.perf_counter()
    out16 = srv16.crossmodal(photo, spec, K=K, key=key)
    honest_sync(out16)
    dt16 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out32 = server.crossmodal(photo, spec, K=K, key=key)
    honest_sync(out32)
    dt32 = time.perf_counter() - t0
    a = np.asarray(out32, np.float32).mean(axis=0)  # posterior-mean spectra
    b = np.asarray(out16, np.float32).mean(axis=0)
    print(json.dumps({
        "metric": "serving_bf16_vs_fp32", "K": K, "bucket": bucket,
        "fp32_ms": round(dt32 * 1e3, 1), "bf16_ms": round(dt16 * 1e3, 1),
        "speedup": round(dt32 / dt16, 2),
        "mean_abs_diff": round(float(np.abs(a - b).mean()), 5),
        "max_abs_diff": round(float(np.abs(a - b).max()), 5),
        "fp32_output_std": round(float(a.std()), 5),
    }), flush=True)


if __name__ == "__main__":
    main()
