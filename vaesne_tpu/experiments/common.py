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
    SURVEY §6).

    Real files are validated against the npz contract (SURVEY §6 /
    test_photospectra.py:22-60) at load: a missing key, flipped mask
    convention, or non-finite column fails HERE with the full problem list
    instead of as NaN losses or silent bias three subsystems later
    (VERDICT r4 #8 — the real-data readiness drill). Set
    ``VAESNE_SKIP_VALIDATE=1`` to load a nonconforming file anyway."""
    if path:
        data = load_npz(path)
        if os.environ.get("VAESNE_SKIP_VALIDATE", "0") in ("0", ""):
            from ..data.validate import validate_npz

            problems = validate_npz(data, kind=kind)
            if problems:
                raise ValueError(
                    f"{path} does not satisfy the {kind} npz contract "
                    f"(SURVEY §6):\n  - " + "\n  - ".join(problems)
                    + "\nFix the file or set VAESNE_SKIP_VALIDATE=1 to "
                    "bypass validation.")
        return data
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


def _mesh_model_axis(train_cfg) -> int:
    """Model-axis size implied by the config's mesh SPEC (static — never
    reads the device environment, so checkpoint opt_state structure stays
    machine-independent: ``"4x2"`` → 2, everything else → 1)."""
    spec = str(getattr(train_cfg, "mesh", "auto")).strip().lower()
    if "x" in spec:
        try:
            return int(spec.split("x", 1)[1])
        except ValueError:
            pass
    return 1


def optimizer_from_config(train_cfg):
    """AdamW exactly as ``train_loop`` builds it for this config — eval
    drivers use the same function so their restore TEMPLATE's opt_state
    structure matches the checkpoint (clipping on/off changes the optax
    chain structure; a tensor-parallel mesh spec forces the unflattened
    moment layout that carries per-param partition specs)."""
    grad_clip = getattr(train_cfg, "grad_clip", 10.0)
    if getattr(train_cfg, "parity", False) or grad_clip <= 0:
        grad_clip = None
    return adamw(
        train_cfg.lr,
        weight_decay=getattr(train_cfg, "weight_decay", 1e-2),
        b1=getattr(train_cfg, "b1", 0.9),
        b2=getattr(train_cfg, "b2", 0.999),
        grad_clip=grad_clip,
        flatten=(_mesh_model_axis(train_cfg) == 1),
    )


def _model_num_heads(model):
    """num_heads for TP head-locality checks; MMVAEs carry it per sub-VAE."""
    if hasattr(model, "num_heads"):
        return model.num_heads
    vaes = getattr(model, "vaes", None)
    if vaes:
        return getattr(vaes[0], "num_heads", None)
    return None


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
    device (strictly fresher than the reference's one-shot host augmentation;
    ``train_cfg.parity=True`` switches to the reference's one-shot draw).

    Checkpoints every ``train_cfg.save_every`` epochs (reference cadence,
    test_photospectra.py:146) into ``{ckpt_dir}/{ckpt_name}``, together with
    the loss history. ``train_cfg.resume=True`` restores that checkpoint and
    continues BIT-exactly: the restored ``TrainState`` carries params,
    optimizer moments, step count and the step-RNG chain, and the epoch-level
    key chain is fast-forwarded to the restored epoch — so
    train-to-epoch-N-kill-resume equals an uninterrupted run (the capability
    the reference lacks entirely: its every-5-epoch whole-model pickle has no
    optimizer state or resume path, SURVEY §5.3/§5.4).

    Optimizer: AdamW with ``train_cfg``'s lr/weight_decay/b1/b2 and
    global-norm clipping at ``train_cfg.grad_clip`` (<= 0 disables).
    ``train_cfg.parity=True`` is the reference-dynamics preset: clipping off
    + one-shot augmentation. ``train_cfg.accum_steps > 1`` enables
    trainer-level gradient accumulation (``accum_reduction`` must match the
    objective's batch reduction — "sum" for m_iwae drivers).

    Parallelism: ``train_cfg.mesh`` (default ``"auto"``) resolves through
    ``parallel.resolve_mesh``; on a multi-chip host every driver trains
    data-parallel with the state replicated, each scanned step's batch
    sharded over the ``data`` axis, and XLA GSPMD inserting the gradient
    all-reduce over ICI — same math as single-device (SURVEY §2.4, replacing
    the reference's one-GPU training at test_photospectra.py:8). A ``"NxM"``
    spec additionally Megatron-shards attention/FFN weights over the
    ``model`` axis (``parallel.shard_state_tp``).
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
    parity = getattr(train_cfg, "parity", False)
    opt = optimizer_from_config(train_cfg)
    if opt_mask is not None:
        import optax

        opt = optax.masked(opt, opt_mask(params))
    state = TrainState.create(params, opt, key)
    from ..parallel import MODEL_AXIS, resolve_mesh

    mesh = resolve_mesh(getattr(train_cfg, "mesh", "auto"),
                        batch_size=train_cfg.batch_size)
    if mesh is not None:
        from ..parallel import DATA_AXIS

        n_data = mesh.shape[DATA_AXIS]
        if train_cfg.batch_size % n_data != 0:
            raise ValueError(
                f"batch_size {train_cfg.batch_size} not divisible by the "
                f"mesh data axis ({n_data}); every step's batch must shard "
                "evenly (set train.batch_size or train.mesh accordingly)")
    accum_steps = getattr(train_cfg, "accum_steps", 1)
    accum_reduction = getattr(train_cfg, "accum_reduction", "mean")
    # scan_epoch (TrainConfig, default True): every step of an epoch runs
    # under one lax.scan in ONE compiled program - same math as the
    # per-batch loop (identical permutation + RNG chain), but one dispatch
    # per epoch instead of one per minibatch. At the reference's batch
    # sizes (16-32) per-step dispatch dominates wall time on
    # remote-dispatch TPUs.
    use_scan = getattr(train_cfg, "scan_epoch", True)
    if use_scan:
        from ..training import make_scan_epoch

        epoch_fn = make_scan_epoch(model, opt, loss_fn, accum_steps,
                                   accum_reduction, mesh=mesh)
    else:
        step_fn = make_train_step(model, opt, loss_fn, accum_steps,
                                  accum_reduction)

    losses = []
    start_epoch = 0
    ckpt_path = os.path.join(train_cfg.ckpt_dir, ckpt_name)
    cfg_dict = None
    if config is not None:
        cfg_dict = asdict(config)
        # tag so utils.checkpoint.restore_config can rebuild the exact
        # experiment config (and eval drivers the exact architecture)
        cfg_dict["_config_class"] = type(config).__name__
    if getattr(train_cfg, "resume", False):
        from ..utils.checkpoint import restore_checkpoint

        if os.path.isdir(os.path.join(ckpt_path, "state")):
            from ..utils.checkpoint import load_config

            saved_cfg = load_config(ckpt_path)
            saved_bs = (saved_cfg or {}).get("train", {}).get("batch_size")
            if saved_bs is not None and saved_bs != train_cfg.batch_size:
                raise ValueError(
                    f"resume geometry mismatch at {ckpt_path}: checkpoint "
                    f"was trained with batch_size={saved_bs}, current run "
                    f"uses {train_cfg.batch_size}. Resuming with a different "
                    "batch size would mis-derive the resume epoch and the "
                    "epoch-key fast-forward; restart with the original "
                    "batch_size or train fresh under a new ckpt name."
                )
            state = restore_checkpoint(ckpt_path, state)
            n = jax.tree_util.tree_leaves(train_data)[0].shape[0]
            steps_per_epoch = n // train_cfg.batch_size
            progress_file = os.path.join(ckpt_path, "progress.json")
            recorded = None
            if os.path.exists(progress_file):
                # explicit epoch record written at save time — immune to
                # dataset-size/repeat-factor drift between runs
                import json as _json

                try:
                    with open(progress_file) as f:
                        recorded = int(_json.load(f)["epochs_done"])
                except (ValueError, KeyError, OSError):
                    # truncated/corrupt record (e.g. killed mid-write before
                    # the atomic-rename fix): fall back to the step counter
                    recorded = None
            step = int(state.step)
            if step % max(1, steps_per_epoch) == 0:
                # The checkpoint's own step counter is authoritative: if it
                # is still epoch-aligned under the CURRENT geometry, derive
                # the resume epoch from it. progress.json may legitimately
                # lag one save window behind (a crash between the orbax save
                # and the progress write) — that must not brick resume.
                start_epoch = step // max(1, steps_per_epoch)
                if recorded is not None and recorded > start_epoch:
                    # A stale record can only LAG the step counter (the
                    # orbax save happens before the progress write), so a
                    # record AHEAD of the derived epoch means the derivation
                    # itself is wrong: the data/batch geometry drifted and
                    # step just happens to divide the new steps_per_epoch.
                    raise ValueError(
                        f"resume geometry mismatch at {ckpt_path}: the "
                        f"checkpoint records {recorded} completed epochs "
                        f"at step {step}, but the current data/batch "
                        f"settings give {steps_per_epoch} steps/epoch "
                        f"(which implies only {start_epoch} epochs). The "
                        "dataset size, repeat factor, or batch size "
                        "changed since the original run."
                    )
                if recorded is not None and recorded != start_epoch and log:
                    print(
                        f"progress.json records {recorded} epochs but the "
                        f"checkpoint step {step} implies {start_epoch}; "
                        "using the checkpoint (stale progress record)"
                    )
            elif recorded is not None:
                raise ValueError(
                    f"resume geometry mismatch at {ckpt_path}: the "
                    f"checkpoint records {recorded} completed epochs "
                    f"at step {step}, but the current data/"
                    f"batch settings give {steps_per_epoch} steps/epoch "
                    f"(expected step {recorded * steps_per_epoch}). "
                    "The dataset size, repeat factor, or batch size "
                    "changed since the original run."
                )
            else:  # pre-progress.json checkpoint: infer from the step count
                start_epoch = step // max(1, steps_per_epoch)
            losses_file = os.path.join(ckpt_path, "losses.npy")
            if os.path.exists(losses_file):
                losses = [float(v) for v in np.load(losses_file)][:start_epoch]
            # fast-forward the epoch key chain so augmentation/shuffle draws
            # continue exactly where the interrupted run left off
            for _ in range(start_epoch):
                key, _, _ = jax.random.split(key, 3)
            if log:
                print(f"resumed from {ckpt_path} at epoch {start_epoch}")
        elif log:
            print(f"resume requested but no checkpoint at {ckpt_path}; "
                  "starting fresh")
    if mesh is not None:
        # placement AFTER any restore: params/opt replicated (or Megatron
        # TP-sharded for an "NxM" spec), data replicated device-resident —
        # each step's batch gets its data-axis sharding inside the compiled
        # epoch (make_scan_epoch) or per batch below
        from ..parallel import (
            replicate_state,
            replicated,
            shard_batch,
            shard_state_tp,
        )

        if mesh.shape[MODEL_AXIS] > 1:
            state = shard_state_tp(state, opt, mesh,
                                   num_heads=_model_num_heads(model))
        else:
            state = replicate_state(state, mesh)
        train_data = jax.device_put(train_data, replicated(mesh))
        if log:
            print(f"training on {mesh.devices.size} devices "
                  f"(mesh {dict(mesh.shape)})")
    if augment_fn is not None:
        # ONE compiled program per epoch instead of an eager op-chain: the
        # tunneled TPU compile service charges ~60 s per uncached one-op
        # program (PERFORMANCE.md "Tunnel compile economics"); every
        # augment_* in data/augment.py is shape-static and jit-safe.
        augment_fn = jax.jit(augment_fn)
    if parity and augment_fn is not None:
        # reference dynamics: ONE augmentation draw before training
        # (test_photometry.py:41-44 augments the host arrays once), not a
        # fresh draw per epoch. Keyed off the seed so resume reproduces it.
        train_data = augment_fn(jax.random.PRNGKey(train_cfg.seed + 1),
                                train_data)
        augment_fn = None
    for epoch in range(start_epoch, train_cfg.epochs):
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
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
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
            np.save(os.path.join(ckpt_path, "losses.npy"),
                    np.asarray(losses, np.float64))
            import json as _json

            # atomic: a kill mid-write must never leave truncated JSON that
            # a later resume would trip over
            progress_tmp = os.path.join(ckpt_path, "progress.json.tmp")
            with open(progress_tmp, "w") as f:
                _json.dump({"epochs_done": epoch + 1}, f)
            os.replace(progress_tmp, os.path.join(ckpt_path, "progress.json"))
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
