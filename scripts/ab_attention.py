"""A/B attention-kernel variants at the flagship bench point.

VERDICT r1 weak #7: record the untried kernel variants honestly. Cases:
  * dropout PRNG widths 32/16/8 (VAESNE_DROPOUT_BITS; the library default
    is 8 since round 3 — the bits32 arm pins the pre-flip baseline
    explicitly) at the default 1024/1024 q-tiles, plus the 512/512 tiling.
  * dropout on vs deterministic=True — puts a current number on the
    dropout-chain cost claim (PERFORMANCE.md).
  * folded vs unfolded 1/(1-rate) rescale (VAESNE_AB_UNFOLD).
All arms pin VAESNE_DROPOUT_BITS explicitly so the table stays correct
if the library default changes again.

Each case runs in a fresh subprocess (env-driven trace-time dispatch;
avoids cross-case jit cache effects) with the forced-sync protocol.

Run on the TPU: python scripts/ab_attention.py
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CASES = [
    # bf16 default tiles are 1024/1024 (ops/attention.py::_q_tile); the
    # library dropout-PRNG default flipped 32 -> 8 in round 3, so the
    # pre-flip baseline must be pinned, not inherited
    ("bits32 dropout (pre-r3 default, qt1024/1024)",
     {"VAESNE_DROPOUT_BITS": "32"}),
    ("qt512/512 bits32 dropout", {"VAESNE_ATTN_QT_FWD": "512",
                                  "VAESNE_ATTN_QT_BWD": "512",
                                  "VAESNE_DROPOUT_BITS": "32"}),
    ("bits16 dropout", {"VAESNE_DROPOUT_BITS": "16"}),
    ("bits8 dropout (library default)", {"VAESNE_DROPOUT_BITS": "8"}),
    # no-dropout ablation at the default tiles
    ("default no-dropout", {"VAESNE_AB_DETERMINISTIC": "1"}),
    # folded-rescale delta (unfolded = the replaced variant)
    ("unfolded rescale dropout", {"VAESNE_AB_UNFOLD": "1",
                                  "VAESNE_DROPOUT_BITS": "32"}),
]

B = 512


def _child():
    os.environ.setdefault("VAESNE_BF16", "1")
    os.environ.setdefault("VAESNE_REMAT", "0")
    deterministic = os.environ.get("VAESNE_AB_DETERMINISTIC") == "1"
    import jax

    import bench
    from vaesne_tpu import objectives
    from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE
    from vaesne_tpu.training import (TrainState, adamw, init_model,
                                     make_train_step)

    model = PhotoSpecMMVAE(
        vaes=[
            PhotometricVAE(num_bands=6, latent_len=4, latent_dim=4,
                           model_dim=32, ff_dim=32),
            SpectraVAE(latent_len=4, latent_dim=4, model_dim=32, ff_dim=32),
        ],
        beta=1.0,
    )
    batch = bench.make_batch(B)
    params = init_model(model, batch, jax.random.PRNGKey(0), K=2)
    opt = adamw(1e-4)
    state = TrainState.create(params, opt, jax.random.PRNGKey(0))

    def loss_fn(m, v, b, k):
        return objectives.m_iwae(m, v, b, K=2, key=k,
                                 deterministic=deterministic)

    step = make_train_step(model, opt, loss_fn)
    state, loss = step(state, batch)
    state, loss = step(state, batch)
    float(loss)  # forced sync (BASELINE.md "Measurement honesty")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(5):
            state, loss = step(state, batch)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / 5)
    print(json.dumps({"step_ms": round(best * 1e3, 2),
                      "samples_per_sec": round(B / best, 1)}))


def main():
    results = {}
    for label, extra in CASES:
        env = dict(os.environ, VAESNE_AB_CHILD="1", **extra)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=900,
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
    if os.environ.get("VAESNE_AB_CHILD"):
        _child()
    else:
        main()
