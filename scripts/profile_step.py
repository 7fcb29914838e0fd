"""Empirical decomposition of the flagship train-step time.

Times sub-graphs of the m-IWAE step in isolation (encoders only, one
spectra decode, full forward, forward+backward) to locate the HBM/compute
hot spots before kernel work. Not part of the driver contract.
"""

import os
import time

os.environ.setdefault("VAESNE_BF16", "1")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

import bench
from vaesne_tpu import objectives
from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE
from vaesne_tpu.training import TrainState, adamw, init_model, make_train_step

B = int(os.environ.get("PROF_B", "1024"))
K = 2


def _sync(out):
    # honest device sync: read a value that depends on the computation
    # (block_until_ready returns early on the axon tunnel; BASELINE.md)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(label, fn, *args, steps=4, windows=2):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"{label:34s} {best*1e3:8.3f} ms")
    return best


def main():
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
    params = init_model(model, batch, key, K=K)
    variables = {"params": params}
    opt = adamw(1e-4)
    # the train step donates its state (buffers freed on use) — give it a
    # private copy so the later sub-graph timings keep a live params tree
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.array, params), opt, jnp.array(key)
    )

    def loss_fn(m, v, b, k):
        return objectives.m_iwae(m, v, b, K=K, key=k, deterministic=False)

    step = make_train_step(model, opt, loss_fn)

    def timed_step():
        # the step donates its input state: rebind from the return value so
        # iteration 2 doesn't touch donated (deleted) buffers on TPU/GPU
        nonlocal_state[0], loss = step(nonlocal_state[0], batch)
        return loss

    nonlocal_state = [state]
    timeit("full train step", timed_step)

    fwd = jax.jit(lambda v, b, k: loss_fn(model, v, b, k))
    timeit("loss forward only", fwd, variables, batch, jax.random.PRNGKey(1))

    # encoders only (both modalities, posterior params)
    @jax.jit
    def encoders(v, b):
        outs = []
        for i, xm in enumerate(b):
            outs.append(model.vaes[i].apply(
                {"params": v["params"][f"vaes_{i}"]}, xm, True,
                method="encode"))
        return outs

    timeit("encoders (photo+spec)", encoders, variables, batch)

    # one spectra decode at K*B rows (the M x M hot quadrant)
    spec = batch[1]
    zs = jnp.zeros((K, B, 4, 4), jnp.float32)

    @jax.jit
    def spec_decode(v, zs, xm):
        return model.vaes[1].apply(
            {"params": v["params"]["vaes_1"]}, zs, xm, method="decode").loc

    timeit("one spectra decode (K*B rows)", spec_decode, variables, zs, spec)

    @jax.jit
    def photo_decode(v, zs, xm):
        return model.vaes[0].apply(
            {"params": v["params"]["vaes_0"]}, zs, xm, method="decode").loc

    timeit("one photo decode (K*B rows)", photo_decode, variables, zs, batch[0])

    gradfn = jax.jit(jax.grad(lambda p, b, k: -loss_fn(model, {"params": p}, b, k)))
    timeit("forward+backward (no optimizer)", gradfn, params, batch, jax.random.PRNGKey(1))


if __name__ == "__main__":
    main()
