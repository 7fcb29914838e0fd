"""Second benchmark operating point: the ZTF flagship (m-IWAE K=8).

VERDICT r4 #5: the headline bench measures exactly one config (Goldstein
K=2, 6 bands, B=192). The reference's OTHER production training config is
ZTF_photospect.py:78-128 — m_iwae **K=8**, **β=0.5**, **2 bands**, same
latent 4×4 / model_dim 32 / 4 layers — which quadruples decoder rows per
sample (R = M·K·B = 16·B vs 4·B). This script measures that point with the
same protocol as ``bench.py`` (one compiled ``lax.scan`` window, forced
sync by reading the loss) and reports samples/sec + MFU from an audited
FLOPs/sample constant (XLA cost model on the pure-XLA lowering, computed
by its own --cost-child, two-point linearity checked — the
``scripts/mfu.py`` method at K=8/2-band shapes).

Grid shapes use the synthetic ZTF contract (982 spectrum bins, 60 LC
points — ``data/synthetic.py::make_ztf_like``, same grids the repo's ZTF
drivers train on).

Run on the TPU:  python scripts/bench_ztf.py [B=48] [B=96] ...
(each B is measured in sequence; default sweep 32/48/96)
"""

import functools
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("VAESNE_BF16", "1")
os.environ.setdefault("VAESNE_REMAT", "0")
os.environ.setdefault(
    "VAESNE_COMPILE_CACHE",
    str(Path(__file__).resolve().parent.parent / ".xla_cache"),
)

K = 8
BETA = 0.5
NUM_BANDS = 2
LP, NS = 60, 982
TIMED_STEPS = 10
V5E_PEAK_BF16 = 197e12


def make_batch(B, seed=0):
    # ONE batch-contract implementation for all benches: bench.make_batch
    # (host-side numpy, tunnel rule documented there)
    import bench

    return bench.make_batch(B, num_bands=NUM_BANDS, lp=LP, ns=NS, seed=seed)


def _model():
    from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE

    return PhotoSpecMMVAE(
        vaes=[
            PhotometricVAE(num_bands=NUM_BANDS, latent_len=4, latent_dim=4,
                           model_dim=32, ff_dim=32),
            SpectraVAE(latent_len=4, latent_dim=4, model_dim=32, ff_dim=32),
        ],
        beta=BETA,
    )


def _loss_fn():
    from vaesne_tpu import objectives

    def loss_fn(m, variables, b, k):
        return objectives.m_iwae(m, variables, b, K=K, key=k,
                                 deterministic=False)

    return loss_fn


def _cost_child():
    """JAX_PLATFORMS=cpu VAESNE_PALLAS=0: FLOPs of the abstract-lowered
    pure-XLA step at two batches (linearity check), printed as JSON."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    from vaesne_tpu.training import TrainState, adamw, make_train_step

    model = _model()
    opt = adamw(1e-3)
    loss_fn = _loss_fn()
    res = []
    for b in (16, 32):
        batch = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), make_batch(b))

        def abstract_state(key, bb):
            variables = model.init({"params": key, "sample": key}, bb, K)
            return TrainState.create(variables["params"], opt, key)

        state = jax.eval_shape(abstract_state, jax.random.PRNGKey(0), batch)
        step = make_train_step(model, opt, loss_fn)
        ca = step.lower(state, batch).cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        res.append(float(ca.get("flops", 0.0)))
    print(json.dumps(res))


def flops_per_sample():
    env = dict(os.environ, JAX_PLATFORMS="cpu", VAESNE_PALLAS="0")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cost-child"],
        env=env, capture_output=True, text=True, timeout=900)
    if out.returncode != 0:
        raise RuntimeError(f"cost child failed: {out.stderr[-1500:]}")
    c1, c2 = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("[")][-1])
    lin = c2 / c1
    if not 1.9 < lin < 2.1:
        raise RuntimeError(f"cost model not linear in B: {lin:.3f}x")
    return c2 / 32.0


def measure(B):
    import jax

    from vaesne_tpu.training import TrainState, adamw, make_train_step

    model = _model()
    batch = jax.device_put(make_batch(B))
    opt = adamw(1e-3)  # reference ZTF lr (ZTF_photospect.py:78)

    @jax.jit
    def _setup(b):
        root = jax.random.PRNGKey(0)
        k_param, k_sample = jax.random.split(root)
        params = model.init({"params": k_param, "sample": k_sample},
                            b, K)["params"]
        return TrainState.create(params, opt, root)

    state = _setup(batch)
    raw_step = make_train_step(model, opt, _loss_fn(), jit=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def window(state, b):
        def body(s, _):
            s, loss = raw_step(s, b)
            return s, loss
        state, losses = jax.lax.scan(body, state, None, length=TIMED_STEPS)
        return state, losses[-1]

    state, loss = window(state, batch)
    float(loss)  # forced sync (tunnel rule)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        state, loss = window(state, batch)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    return TIMED_STEPS * B / best


def main():
    bs = [int(a.split("=", 1)[1]) for a in sys.argv[1:] if a.startswith("B=")]
    bs = bs or [32, 48, 96]
    fps = flops_per_sample()
    print(f"flops/sample (K={K}, pure-XLA cost model): {fps/1e9:.2f} GFLOP")
    for B in bs:
        sps = measure(B)
        print(json.dumps({
            "metric": "ztf_mmvae_miwae_train_throughput",
            "B": B, "K": K, "beta": BETA, "num_bands": NUM_BANDS,
            "value": round(sps, 2), "unit": "samples/sec",
            "mfu_pct": round(100 * fps * sps / V5E_PEAK_BF16, 2),
            "precision": "bf16" if os.environ.get("VAESNE_BF16") != "0"
            else "fp32",
        }), flush=True)


if __name__ == "__main__":
    if "--cost-child" in sys.argv:
        _cost_child()
    else:
        main()
