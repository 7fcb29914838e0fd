"""Replay the flagship training trajectory and dissect the first NaN step.

Reproduces train_photospectra's exact state at the divergence (same seeds,
same config), then instruments each m-IWAE term to find which goes
non-finite first.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from vaesne_tpu import objectives
from vaesne_tpu.data import augment_multimodal, multimodal_tuple
from vaesne_tpu.distributions import log_mean_exp
from vaesne_tpu.experiments.common import resolve_dataset, split_tuples
from vaesne_tpu.experiments.train_photospectra import build_model
from vaesne_tpu.training import TrainState, adamw, epoch_batches, init_model, make_train_step
from vaesne_tpu.utils.config import PhotoSpectraMMVAEConfig, parse_overrides

cfg = parse_overrides(PhotoSpectraMMVAEConfig(),
                      ["train.epochs=400", "train.batch_size=128"])
data = resolve_dataset(None, "goldstein", seed=cfg.train.seed)
train_data, _ = split_tuples(data, multimodal_tuple)
model = build_model(cfg)

key = jax.random.PRNGKey(cfg.train.seed)
k_init, key = jax.random.split(key)
example = jax.tree_util.tree_map(lambda a: a[:2], train_data)
params = init_model(model, example, k_init, K=cfg.train.K)
opt = adamw(cfg.train.lr)
state = TrainState.create(params, opt, key)


def loss_fn(m, variables, batch, k):
    return objectives.m_iwae(m, variables, batch, K=cfg.train.K, key=k,
                             deterministic=False)


step_fn = make_train_step(model, opt, loss_fn)


@jax.jit
def diagnostics(params, batch, k):
    ks, kd = jax.random.split(k)
    qz_xs, px_zs, zss = model.apply(
        {"params": params}, batch, cfg.train.K, False,
        rngs={"sample": ks, "dropout": kd},
    )
    out = {}
    for m in range(2):
        out[f"q{m}_scale_min"] = qz_xs[m].scale.min()
        out[f"q{m}_scale_max"] = qz_xs[m].scale.max()
        out[f"q{m}_mu_absmax"] = jnp.abs(qz_xs[m].loc).max()
        out[f"z{m}_absmax"] = jnp.abs(zss[m]).max()
        for d in range(2):
            out[f"loc{m}{d}_absmax"] = jnp.abs(px_zs[m][d].loc).max()
            lp = px_zs[m][d].log_prob(batch[d][0][None])
            out[f"lpx{m}{d}_min"] = lp.min()
    pz = model.pz()
    for r in range(2):
        out[f"lpz{r}_min"] = pz.log_prob(zss[r]).sum((-1, -2)).min()
        lqz = log_mean_exp(
            jnp.stack([qz.log_prob(zss[r]).sum((-1, -2)) for qz in qz_xs]))
        out[f"lqz{r}_absmax"] = jnp.abs(lqz).max()
    return out


def param_health(params):
    leaves = jax.tree_util.tree_leaves(params)
    finite = all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    absmax = max(float(jnp.abs(l).max()) for l in leaves)
    return finite, absmax


key_run = key
for epoch in range(400):
    key_run, k_aug, k_shuffle = jax.random.split(key_run, 3)
    epoch_data = augment_multimodal(k_aug, train_data)
    step_losses = []
    for batch in epoch_batches(k_shuffle, epoch_data, cfg.train.batch_size):
        if epoch >= 88:
            d = diagnostics(state.params, batch, jax.random.split(state.rng)[0])
            d = {k_: float(v) for k_, v in d.items()}
            bad = {k_: v for k_, v in d.items() if not np.isfinite(v)}
            fin, absmax = param_health(state.params)
            print(f"epoch {epoch} step{len(step_losses)}: params_finite={fin} "
                  f"params_absmax={absmax:.3e} "
                  f"q0_scale=[{d['q0_scale_min']:.3e},{d['q0_scale_max']:.3e}] "
                  f"q1_scale=[{d['q1_scale_min']:.3e},{d['q1_scale_max']:.3e}] "
                  f"z0={d['z0_absmax']:.3e} z1={d['z1_absmax']:.3e} "
                  f"loc01={d['loc01_absmax']:.3e} lpx01_min={d['lpx01_min']:.3e} "
                  f"lqz0={d['lqz0_absmax']:.3e} lqz1={d['lqz1_absmax']:.3e}"
                  + (f"  NONFINITE: {sorted(bad)}" if bad else ""))
        state, loss = step_fn(state, batch)
        step_losses.append(loss)
    mean_loss = float(jnp.stack(step_losses).mean())
    if epoch % 10 == 0 or epoch >= 88:
        print(f"epoch {epoch}: loss {mean_loss:.2f}")
    if not np.isfinite(mean_loss):
        print(f"FIRST NON-FINITE EPOCH: {epoch}")
        if epoch > 94:
            break
