"""Shared experiment-driver machinery.

The reference's ``cannon/*.py`` scripts each repeat the same skeleton: load an
npz, build tensors with host-side augmentation, construct a model, loop epochs
with ``training_step``, dump a loss PNG and a whole-model pickle every 5
epochs (e.g. test_photospectra.py:19-154). Here that skeleton is one reusable
driver: data is resolved once into device-resident arrays (a real npz path or
the synthetic generator), augmentation is a pure per-epoch on-device function,
the train step is one fused jitted program, and checkpoints are full
``TrainState`` pytrees. Every ``train_*.py`` in this package is then just a
config + model assembly.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import numpy as np

from ..data import (
    load_npz,
    make_goldstein_like,
    make_ztf_like,
    multimodal_tuple,
    photometry_tuple,
    spectra_tuple,
)
from ..training import (
    TrainState,
    adamw,
    epoch_batches,
    init_model,
    make_train_step,
)
from ..utils.checkpoint import save_checkpoint
from ..utils.config import asdict
from ..utils.plotting import plot_loss_curve

Array = jax.Array


def resolve_dataset(
    path: Optional[str],
    kind: str = "goldstein",
    n_synthetic: int = 512,
    seed: int = 0,
):
    """Load a real npz if ``path`` is given, else generate synthetic data with
    the same key contract (the repo's data symlink is external and absent —
    SURVEY §6)."""
    if path:
        return load_npz(path)
    maker = make_goldstein_like if kind == "goldstein" else make_ztf_like
    return maker(n=n_synthetic, seed=seed)


def split_tuples(data, builder: Callable):
    """(train_tuple, test_tuple) via the npz's stored train/test indices."""
    return (
        builder(data, idx=np.asarray(data["training_idx"])),
        builder(data, idx=np.asarray(data["testing_idx"])),
    )


TUPLE_BUILDERS = {
    "photometry": photometry_tuple,
    "spectra": spectra_tuple,
    "multimodal": multimodal_tuple,
}


def train_loop(
    model,
    train_data,
    loss_fn,
    train_cfg,
    *,
    config: Any = None,
    augment_fn: Optional[Callable] = None,
    has_sample_rng: bool = True,
    init_K: Optional[int] = None,
    ckpt_name: str = "model",
    callback: Optional[Callable] = None,
    log: bool = True,
    init_data=None,
    install_params=None,
    opt_mask: Optional[Callable] = None,
):
    """Full training driver. Returns (state, losses).

    ``loss_fn(model, variables, batch, key) -> scalar objective`` (maximized).
    ``augment_fn(key, epoch_data) -> epoch_data`` runs once per epoch on
    device (strictly fresher than the reference's one-shot host augmentation).
    Checkpoints every ``train_cfg.save_every`` epochs (reference cadence,
    test_photospectra.py:146) into ``{ckpt_dir}/{ckpt_name}``.
    """
    key = jax.random.PRNGKey(train_cfg.seed)
    k_init, key = jax.random.split(key)
    example = jax.tree_util.tree_map(
        lambda a: a[: min(2, a.shape[0])],
        train_data if init_data is None else init_data,
    )
    params = init_model(
        model, example, k_init,
        K=init_K if init_K is not None else train_cfg.K,
        has_sample_rng=has_sample_rng,
    )
    if install_params:
        # overwrite subtrees with externally supplied (e.g. pretrained
        # backbone) weights; combine with ``opt_mask`` to freeze them
        params = {**params, **install_params}
    opt = adamw(train_cfg.lr)
    if opt_mask is not None:
        import optax

        opt = optax.masked(opt, opt_mask(params))
    state = TrainState.create(params, opt, key)
    # scan_epoch (TrainConfig, default True): every step of an epoch runs
    # under one lax.scan in ONE compiled program - same math as the
    # per-batch loop (identical permutation + RNG chain), but one dispatch
    # per epoch instead of one per minibatch. At the reference's batch
    # sizes (16-32) per-step dispatch dominates wall time on
    # remote-dispatch TPUs.
    use_scan = getattr(train_cfg, "scan_epoch", True)
    if use_scan:
        from ..training import make_scan_epoch

        epoch_fn = make_scan_epoch(model, opt, loss_fn)
    else:
        step_fn = make_train_step(model, opt, loss_fn)

    losses = []
    ckpt_path = os.path.join(train_cfg.ckpt_dir, ckpt_name)
    cfg_dict = asdict(config) if config is not None else None
    for epoch in range(train_cfg.epochs):
        key, k_aug, k_shuffle = jax.random.split(key, 3)
        epoch_data = train_data if augment_fn is None else augment_fn(k_aug, train_data)
        if use_scan:
            state, mean_loss = epoch_fn(
                state, epoch_data, k_shuffle, train_cfg.batch_size
            )
            losses.append(mean_loss)
        else:
            # keep per-step losses on device; ONE host sync per epoch (a
            # per-step float() costs a device round-trip per step, which
            # dominates wall time for small models on remote-dispatch TPUs)
            step_losses = []
            for batch in epoch_batches(k_shuffle, epoch_data, train_cfg.batch_size):
                state, loss = step_fn(state, batch)
                step_losses.append(loss)
            import jax.numpy as jnp

            losses.append(
                float(jnp.stack(step_losses).mean()) if step_losses else 0.0
            )
        if log:
            print(f"epoch {epoch + 1}/{train_cfg.epochs}: loss {losses[-1]:.6f}")
        if (epoch + 1) % train_cfg.save_every == 0 or epoch + 1 == train_cfg.epochs:
            save_checkpoint(ckpt_path, state, cfg_dict)
            os.makedirs(train_cfg.log_dir, exist_ok=True)
            plot_loss_curve(
                losses, path=os.path.join(train_cfg.log_dir, f"{ckpt_name}_loss.png")
            )
        if callback is not None:
            callback(epoch, state, losses[-1])
    return state, losses


def parse_cli(argv, default_data=None):
    """Split ``data=/path.npz`` off the override list: returns (path, rest)."""
    data_path, rest = default_data, []
    for a in argv:
        if a.startswith("data="):
            data_path = a.split("=", 1)[1]
        else:
            rest.append(a)
    return data_path, rest
