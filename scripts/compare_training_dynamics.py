"""Same-seed training-dynamics comparison: PyTorch reference vs framework.

VERDICT r1 item 6: the parity suite proves the forward math to ~1e-7, but the
training trajectories were never compared. This script runs BOTH sides from
the SAME initial weights (torch init imported through utils.torch_port) on
the SAME data stream with the SAME optimizer settings (torch AdamW defaults,
no clipping — the ``parity`` preset) and records the per-step m-IWAE loss
curves side by side.

Both sides draw their own posterior samples (torch RNG vs JAX PRNG — the
reparameterization noise cannot be made bit-identical without rewriting one
side), so the curves agree up to K-sample Monte-Carlo noise, not bitwise.
The probe below measures the MC spread of the per-step loss at fixed
params across independent keys; trajectory agreement within a few
multiples of that noise floor is the pass criterion.

CPU-friendly: run with JAX_PLATFORMS=cpu for an apples-to-apples host run.
  JAX_PLATFORMS=cpu python scripts/compare_training_dynamics.py [steps=30]

Output: JSON {torch_losses, jax_losses, rel_diff_per_step, mc_noise_rel}.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("VAESNE_BF16", "0")  # parity runs are fp32

import numpy as np
import torch

REF = os.environ.get("VAESNE_REFERENCE", "/root/reference/package")
if REF not in sys.path:
    sys.path.insert(0, REF)

from VAESNe.PhotometricVAE import PhotometricVAE as TorchPhotometricVAE  # noqa: E402
from VAESNe.SpectraVAE import SpectraVAE as TorchSpectraVAE  # noqa: E402
from VAESNe.mmVAE import photospecMMVAE as TorchPhotoSpecMMVAE  # noqa: E402
from VAESNe.losses import m_iwae as torch_m_iwae  # noqa: E402

B, LP, NS = 16, 60, 982
K = 2  # the flagship's exact K (test_photospectra.py:144); the MC noise
        # floor this implies is measured by the probe below
DIMS = dict(latent_len=4, latent_dim=4, model_dim=32, num_heads=4, ff_dim=32,
            num_layers=4)
LR = 1e-4


def make_batches(n_steps, seed=0):
    """One fixed batch per step, shared verbatim by both sides."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_steps):
        photo = (
            rng.normal(size=(B, LP)).astype(np.float32),
            np.sort(rng.uniform(-1, 1, (B, LP)), axis=1).astype(np.float32),
            rng.integers(0, 6, (B, LP)),
            rng.uniform(size=(B, LP)) < 0.2,
        )
        spec = (
            rng.normal(size=(B, NS)).astype(np.float32),
            np.tile(np.linspace(-1, 1, NS, dtype=np.float32), (B, 1)),
            rng.normal(size=(B,)).astype(np.float32),
            rng.uniform(size=(B, NS)) < 0.2,
        )
        out.append((photo, spec))
    return out


def torch_run(batches, state_dict):
    model = TorchPhotoSpecMMVAE(
        vaes=[TorchPhotometricVAE(num_bands=6, **DIMS),
              TorchSpectraVAE(**DIMS)],
        beta=1.0)
    model.load_state_dict(state_dict)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=LR)  # no clipping
    torch.manual_seed(42)

    def to_t(mod):
        f, a, b, m = mod
        sec = torch.tensor(b, dtype=torch.int64) if b.dtype.kind == "i" \
            else torch.tensor(b)
        return (torch.tensor(f), torch.tensor(a), sec, torch.tensor(m))

    losses = []
    for photo, spec in batches:
        x = [to_t(photo), to_t(spec)]
        opt.zero_grad()
        loss = -torch_m_iwae(model, x, K=K)
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses


def jax_run(batches, state_dict, mc_probe_keys=8):
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the env var alone does not stick under the axon TPU plugin —
        # config.update is the authoritative override (tests/conftest.py)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # TPU matmuls default to reduced-precision passes; parity comparisons
    # need true fp32 (same setting the golden-parity conftest pins)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from vaesne_tpu import objectives
    from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE
    from vaesne_tpu.training import TrainState, adamw, make_train_step
    from vaesne_tpu.utils.torch_port import convert_photospec_mmvae

    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, **DIMS), SpectraVAE(**DIMS)],
        beta=1.0)
    params = convert_photospec_mmvae(state_dict)

    def to_j(mod):
        f, a, b, m = mod
        sec = jnp.asarray(b, jnp.int32) if b.dtype.kind == "i" else jnp.asarray(b)
        return (jnp.asarray(f), jnp.asarray(a), sec, jnp.asarray(m))

    jbatches = [(to_j(p), to_j(s)) for p, s in batches]

    def loss_fn(m, variables, b, k):
        return objectives.m_iwae(m, variables, b, K=K, key=k,
                                 deterministic=False)

    # parity dynamics: torch AdamW defaults, NO grad clipping
    opt = adamw(LR, grad_clip=None)
    state = TrainState.create(params, opt, jax.random.PRNGKey(42))
    step = make_train_step(model, opt, loss_fn)

    # MC noise floor: loss spread at the initial params across fresh keys
    # (jitted once — eager m_iwae at these shapes is minutes per call on CPU)
    probe_fn = jax.jit(lambda k: objectives.m_iwae(
        model, {"params": params}, jbatches[0], K=K, key=k,
        deterministic=False))
    probe = [float(probe_fn(jax.random.PRNGKey(1000 + i)))
             for i in range(mc_probe_keys)]
    mc_rel = float(np.std(probe) / abs(np.mean(probe)))

    # step returns -loss_fn, the same minimized quantity torch_run records
    losses = []
    for b in jbatches:
        state, loss = step(state, b)
        losses.append(float(loss))
    return losses, mc_rel


def main():
    n_steps = 25
    for a in sys.argv[1:]:
        if a.startswith("steps="):
            n_steps = int(a.split("=", 1)[1])
    batches = make_batches(n_steps)

    torch.manual_seed(0)
    init_model = TorchPhotoSpecMMVAE(
        vaes=[TorchPhotometricVAE(num_bands=6, **DIMS),
              TorchSpectraVAE(**DIMS)],
        beta=1.0)
    state_dict = init_model.state_dict()

    t0 = time.perf_counter()
    jl, mc_rel = jax_run(batches, state_dict)
    t_jax = time.perf_counter() - t0
    t0 = time.perf_counter()
    tl = torch_run(batches, state_dict)
    t_torch = time.perf_counter() - t0

    rel = [abs(a - b) / abs(b) for a, b in zip(jl, tl)]
    out = {
        "steps": n_steps, "B": B, "K": K,
        "torch_losses": [round(x, 4) for x in tl],
        "jax_losses": [round(x, 4) for x in jl],
        "rel_diff_per_step": [round(x, 6) for x in rel],
        "max_rel_diff": round(max(rel), 6),
        "mean_rel_diff": round(float(np.mean(rel)), 6),
        "mc_noise_rel": round(mc_rel, 6),
        "torch_sec": round(t_torch, 1), "jax_sec": round(t_jax, 1),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
