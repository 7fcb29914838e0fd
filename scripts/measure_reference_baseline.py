"""Measure the PyTorch reference's CPU training throughput (the baseline).

Runs the reference package (read-only at /root/reference) on a synthetic
Goldstein-shaped batch with the flagship config (test_photospectra.py:93-144:
latent 4x4, model_dim 32, m_iwae K=2, batch 16, AdamW lr 1e-4) and times
full train steps (forward + backward + optimizer). The resulting
samples/sec number is recorded in BASELINE.md and hardcoded as the
``vs_baseline`` denominator in bench.py.

Usage: python scripts/measure_reference_baseline.py
"""

import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/root/reference/package")

from VAESNe.PhotometricVAE import PhotometricVAE  # noqa: E402
from VAESNe.SpectraVAE import SpectraVAE  # noqa: E402
from VAESNe.mmVAE import photospecMMVAE  # noqa: E402
from VAESNe.losses import m_iwae  # noqa: E402

B, LP, NS = 16, 60, 982
K = 2

torch.manual_seed(0)
rng = np.random.default_rng(0)


def make_batch():
    photo = (
        torch.tensor(rng.normal(size=(B, LP)), dtype=torch.float32),
        torch.tensor(np.sort(rng.uniform(-1, 1, (B, LP)), axis=1), dtype=torch.float32),
        torch.tensor(rng.integers(0, 6, (B, LP)), dtype=torch.int64),
        torch.tensor(rng.uniform(size=(B, LP)) < 0.2),
    )
    spec = (
        torch.tensor(rng.normal(size=(B, NS)), dtype=torch.float32),
        torch.tensor(np.linspace(-1, 1, NS)[None].repeat(B, 0), dtype=torch.float32),
        torch.tensor(rng.normal(size=(B,)), dtype=torch.float32),
        torch.tensor(rng.uniform(size=(B, NS)) < 0.2),
    )
    return [photo, spec]


def main():
    photo_vae = PhotometricVAE(num_bands=6, latent_len=4, latent_dim=4,
                               model_dim=32, num_heads=4, ff_dim=32,
                               num_layers=4)
    spec_vae = SpectraVAE(latent_len=4, latent_dim=4, model_dim=32,
                          num_heads=4, ff_dim=32, num_layers=4)
    model = photospecMMVAE(vaes=[photo_vae, spec_vae], beta=1.0)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    batch = make_batch()

    def step():
        opt.zero_grad()
        loss = -m_iwae(model, batch, K=K)
        loss.backward()
        opt.step()
        return float(loss)

    # warmup
    step()
    n_steps = 5
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = time.perf_counter() - t0
    sps = n_steps * B / dt
    print(f"steps/sec: {n_steps / dt:.4f}")
    print(f"samples/sec (batch {B}, K={K}): {sps:.2f}")


if __name__ == "__main__":
    main()
