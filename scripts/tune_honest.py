"""Honest (sync-forced) A/B tuning of the flagship train step.

``jax.block_until_ready`` does not synchronize on the tunneled axon backend,
so every timing here syncs by reading the loss value back to host. Compares
remat on/off, flattened optimizer on/off, and batch sizes.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CASES = [
    # (label, VAESNE_BF16, VAESNE_REMAT, flatten, B)
    ("bf16 remat0 flat B1024", "1", "0", True, 1024),
    ("bf16 remat1 flat B1024", "1", "1", True, 1024),
    ("bf16 remat0 noflat B1024", "1", "0", False, 1024),
    ("bf16 remat0 flat B256", "1", "0", True, 256),
    ("bf16 remat0 flat B512", "1", "0", True, 512),
    ("fp32 remat0 flat B512", "0", "0", True, 512),
]


def run_case(bf16, remat, flatten, B, steps=4):
    os.environ["VAESNE_BF16"] = bf16
    os.environ["VAESNE_REMAT"] = remat
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
    params = init_model(model, batch, jax.random.PRNGKey(0), K=2)
    opt = adamw(1e-4, flatten=flatten)

    def loss_fn(m, v, b, k):
        return objectives.m_iwae(m, v, b, K=2, key=k, deterministic=False)

    step = make_train_step(model, opt, loss_fn)
    state = TrainState.create(params, opt, jax.random.PRNGKey(0))
    state, loss = step(state, batch)
    float(loss)  # honest sync (includes compile)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, batch)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    return dt, B / dt


if __name__ == "__main__":
    which = int(sys.argv[1]) if len(sys.argv) > 1 else None
    for i, (label, bf16, remat, flatten, B) in enumerate(CASES):
        if which is not None and i != which:
            continue
        dt, sps = run_case(bf16, remat, flatten, B)
        print(f"{label:28s} {dt*1e3:9.1f} ms/step {sps:9.1f} samples/s",
              flush=True)
