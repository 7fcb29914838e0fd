"""FLOPs-based MFU and bytes-based roofline position for the flagship step.

VERDICT r1 "what's missing" #7: PERFORMANCE.md argued speed-of-light
qualitatively; this script puts numbers on it.

Method (three independent measurements):
  * FLOPs/step from XLA's cost model on the PURE-XLA compilation of the
    identical train step, compiled **on the CPU backend in a subprocess**
    (JAX_PLATFORMS=cpu). The math is the same ops whether attention runs
    through Pallas or XLA, but (a) XLA's cost analysis cannot see inside a
    Pallas custom call, and (b) the pure-XLA graph materializes the
    [M*K*B, H, 982, 982] logits, which fails TPU compile-time memory
    assignment at the bench batch — CPU compilation has no such limit.
    Counted at two small batches, checked linear, scaled to B.
  * HBM bytes/step from the cost analysis of the REAL (Pallas-dispatch)
    TPU compilation at the full batch: for a custom call XLA counts
    operand+output bytes, which is exactly the HBM traffic of a fused
    kernel, so this graph — not the pure-XLA one with its materialized
    982^2 logits — gives the honest bytes number.
  * Wall time from the real step with the forced-sync protocol (read the
    loss; block_until_ready is not a barrier on the tunneled axon backend —
    BASELINE.md "Measurement honesty").

MFU = flops / dt / peak.  v5e peak: 197e12 FLOP/s bf16 MXU; HBM 819 GB/s
-> ridge point ~240 FLOP/byte.

Run on the TPU (NOT under the CPU test conftest):
  python scripts/mfu.py [B=512]
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("VAESNE_BF16", "1")
os.environ.setdefault("VAESNE_REMAT", "0")

V5E_PEAK_BF16 = 197e12   # FLOP/s per chip (public v5e spec)
V5E_HBM_BW = 819e9       # bytes/s per chip


def build(B, K=2):
    import jax

    import bench
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
    params = init_model(model, batch, jax.random.PRNGKey(0), K=K)
    opt = adamw(1e-4)
    state = TrainState.create(params, opt, jax.random.PRNGKey(0))

    def loss_fn(m, v, b, k):
        return objectives.m_iwae(m, v, b, K=K, key=k, deterministic=False)

    step = make_train_step(model, opt, loss_fn)
    return step, state, batch


def _cost_dict(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", 0.0)),
        "transcendentals": float(ca.get("transcendentals", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
    }


def flops_of_step(B, cost_b=64):
    """Pure-XLA FLOPs, compiled on CPU in a subprocess, scaled to B.

    Two-point linearity check: every per-sample term scales exactly linearly
    in batch; the only fixed-size part is the AdamW update over ~120k params
    (~1e6 FLOPs, noise at this scale)."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        VAESNE_PALLAS="0",
        VAESNE_MFU_COST_B=str(cost_b),
    )
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cost-child"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    if out.returncode != 0:
        raise RuntimeError(f"cost child failed: {out.stderr[-2000:]}")
    line = [l for l in out.stdout.splitlines() if l.startswith("[")][-1]
    c1, c2 = json.loads(line)
    lin = c2["flops"] / c1["flops"]
    if not 1.9 < lin < 2.1:
        raise RuntimeError(f"cost model not linear in B: {lin:.3f}x")
    scale = B / (2 * cost_b)
    return {k: v * scale for k, v in c2.items()}


def _build_abstract(B, K=2):
    """ShapeDtypeStruct-only build: NOTHING concrete is ever computed.

    A concrete ``build()`` at the cost batch runs flax ``model.init``
    eagerly — unjitted 982x982 attention on the 1-core host, >15 min. The
    cost model only needs shapes, so init/opt-state/batch are all traced
    through ``jax.eval_shape`` and the step is lowered over abstract
    arguments (``jit.lower`` accepts ShapeDtypeStructs)."""
    import jax

    import bench
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
    batch = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), bench.make_batch(B)
    )
    opt = adamw(1e-4)

    def abstract_state(key, b):
        variables = model.init({"params": key, "sample": key}, b, K)
        return TrainState.create(variables["params"], opt, key)

    state = jax.eval_shape(abstract_state, jax.random.PRNGKey(0), batch)

    def loss_fn(m, v, b, k):
        return objectives.m_iwae(m, v, b, K=K, key=k, deterministic=False)

    step = make_train_step(model, opt, loss_fn)
    return step, state, batch


def _cost_child():
    """Runs under JAX_PLATFORMS=cpu VAESNE_PALLAS=0: prints [cost(b), cost(2b)].

    Uses ``Lowered.cost_analysis()`` (the UNOPTIMIZED-HLO cost model): a
    full optimized CPU compile of this graph exceeds 15 minutes on the
    1-core host, and the TPU compile of the pure-XLA graph fails memory
    assignment (the materialized [M*K*B, H, 982, 982] logits). The
    dominant matmul FLOPs are identical pre/post optimization; elementwise
    counts can differ slightly from the executed graph — treated as the
    cost model's resolution."""
    import jax

    # the env var alone does not stick under the axon plugin (its
    # sitecustomize re-registers the TPU backend) — this is authoritative:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    cost_b = int(os.environ["VAESNE_MFU_COST_B"])
    res = []
    for b in (cost_b, 2 * cost_b):
        step, state, batch = _build_abstract(b)
        res.append(_cost_dict(step.lower(state, batch)))
    print(json.dumps(res))


def timed_step(B, steps=5, windows=2):
    """Real (Pallas-dispatch) TPU step: HBM bytes from its own cost
    analysis + honest wall time. Returns (seconds, bytes_per_step)."""
    step, state, batch = build(B)
    compiled = step.lower(state, batch).compile()
    hbm_bytes = _cost_dict(compiled)["bytes"]
    state, loss = step(state, batch)
    state, loss = step(state, batch)
    float(loss)  # forced sync
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = step(state, batch)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    return best / steps, hbm_bytes


def main():
    B = 512
    for a in sys.argv[1:]:
        if a.startswith("B="):
            B = int(a.split("=", 1)[1])
    cost = flops_of_step(B)
    dt, hbm_bytes = timed_step(B)
    flops = cost["flops"]
    mfu = flops / dt / V5E_PEAK_BF16
    intensity = flops / hbm_bytes if hbm_bytes else float("nan")
    ridge = V5E_PEAK_BF16 / V5E_HBM_BW
    hbm_time = hbm_bytes / V5E_HBM_BW
    mxu_time = flops / V5E_PEAK_BF16
    out = {
        "B": B,
        "step_ms": round(dt * 1e3, 2),
        "samples_per_sec": round(B / dt, 1),
        "flops_per_step": flops,
        "flops_per_sample": round(flops / B),
        "transcendentals_per_step": cost["transcendentals"],
        "hbm_bytes_per_step": hbm_bytes,
        "mfu_pct": round(100 * mfu, 2),
        "arith_intensity_flops_per_byte": round(intensity, 1),
        "ridge_point_flops_per_byte": round(ridge, 1),
        "hbm_bound_ms": round(hbm_time * 1e3, 2),
        "mxu_bound_ms": round(mxu_time * 1e3, 2),
        "hbm_bw_utilization_pct": round(100 * hbm_time / dt, 2),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    if "--cost-child" in sys.argv:
        _cost_child()
    else:
        main()
