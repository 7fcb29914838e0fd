"""Training loop: one fused jitted train step + a minimal epoch driver.

Capability mirrored from reference ``training_util.py:17-53`` — with the torch
per-batch host→device copies, Python autograd step, and ``gc.collect()``
memory hygiene replaced by the TPU-native shape: data lives device-resident,
and encoder forward, K-sample decode fan-out, objective, grads, and the AdamW
update all fuse into ONE compiled XLA program per step.

Sign convention preserved exactly: objectives are maximization quantities and
the step minimizes ``-objective`` (training_util.py:42), so reported losses
are directly comparable with the reference's printed losses.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

Array = jax.Array
# loss_fn(model, variables, batch, key) -> scalar objective (to maximize),
# the JAX analog of the reference's `lambda model, x: m_iwae(model, x, K=K)`.
LossFn = Callable[[Any, Any, Any, Array], Array]


def safelog10(x: float) -> float:
    """log10 clamped at 1e-10 (reference training_util.py:11-13; unused
    there, kept for API-surface completeness)."""
    import math

    return math.log10(max(1e-10, x))


def adamw(lr: float, weight_decay: float = 1e-2, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, grad_clip: Optional[float] = 10.0,
          flatten: bool = True) -> optax.GradientTransformation:
    """AdamW with torch defaults (the reference's optimizer, e.g.
    test_photospectra.py:135; optax's default weight_decay differs from
    torch's 1e-2 — pinned for parity).

    ``grad_clip`` adds global-norm clipping ahead of the update. The
    reference has no spike protection and its IWAE training does go
    non-finite (it ships a ``breakpoint()`` NaN guard at
    PhotometricVAE.py:160); a 10.0 threshold is far above healthy gradient
    norms and only catches the divergence spikes. Pass ``None`` to disable.

    ``flatten`` wraps the update in ``optax.flatten``: the VAESNe param tree
    is ~350 small leaves; flattening runs the identical math on one
    concatenated vector instead of hundreds of tiny per-leaf kernels. Honest
    device-synced timing found this wall-neutral on TPU (the earlier
    "2.4× step speedup" was a host-dispatch artifact — BASELINE.md
    "Measurement honesty"); it is kept for dispatch/graph hygiene. Pass
    ``False`` when optimizer moments must mirror the param tree — e.g.
    tensor-parallel sharding (``parallel.shard_state_tp``). NB flatten
    True/False produce DIFFERENT opt_state pytree structures, so a
    checkpoint saved with one cannot restore into a template built with the
    other (``utils.checkpoint.restore_checkpoint`` raises an actionable
    error on that mismatch).
    """
    opt = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    if grad_clip is not None:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    if flatten:
        opt = optax.flatten(opt)
    return opt


class TrainState(struct.PyTreeNode):
    """Pure pytree of everything a step mutates: params, opt state, step, rng.

    (The reference keeps optimizer state implicit in the torch object and
    never checkpoints it — SURVEY §5.4; here it is first-class and saved.)
    """

    params: Any
    opt_state: Any
    step: Array
    rng: Array

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation, rng: Array):
        return cls(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=rng,
        )


def init_model(model, x, key: Array, K: int = 1, has_sample_rng: bool = True):
    """Initialize model parameters on an example batch.

    The init runs as ONE jitted program: run eagerly, flax dispatches
    every op as its own tiny XLA compile — harmless locally, but a
    tunneled TPU compile service charges ~60 s per uncached program
    (measured 2026-08-19: the eager init chain cost the bench minutes of
    one-op compiles), and one program is one persistent-cache entry.
    """
    k_param, k_sample = jax.random.split(key)
    rngs = {"params": k_param}
    if has_sample_rng:
        rngs["sample"] = k_sample
        variables = jax.jit(lambda r, ex: model.init(r, ex, K))(rngs, x)
    else:
        variables = jax.jit(model.init)(rngs, x)
    return variables["params"]


def accumulate_gradients(
    neg_loss_fn: Callable[[Any, Any, Array], Array],
    params,
    batch,
    key: Array,
    accum_steps: int,
    reduction: str = "mean",
) -> Tuple[Array, Any]:
    """Microbatched value-and-grad: the TPU-native replacement for the
    reference's ``compute_microbatch_split`` (losses.py:68-76), which chops
    the batch inside ``m_iwae`` so ``K × data`` chunks fit GPU memory.

    The batch axis is reshaped into ``accum_steps`` equal microbatches and a
    ``lax.scan`` accumulates grads, so peak activation memory is that of ONE
    microbatch while the optimizer still sees a single whole-batch update.

    ``reduction`` must match the objective's batch reduction for exact
    whole-batch equivalence:
      * ``"mean"`` — averages microbatch losses/grads (objectives that mean
        over the batch AND decompose per-sample, e.g. ``elbo``, ``mse``);
      * ``"sum"`` — sums them (objectives that sum over the batch, e.g.
        ``m_iwae`` — exactly the chunk-concat-then-sum structure of reference
        losses.py:81-93).

    ``neg_info_nce`` is NOT decomposable across microbatches: each anchor's
    negative pool is the rest of its (micro)batch, so accumulation shrinks
    the pool to the microbatch and optimizes a strictly weaker contrastive
    objective. The contrastive driver warns when ``accum_steps > 1``.

    Each microbatch gets ``fold_in(key, i)`` so RNG streams stay independent.
    """
    if reduction not in ("mean", "sum"):
        raise ValueError(f"reduction must be 'mean' or 'sum', got {reduction!r}")
    n = jax.tree_util.tree_leaves(batch)[0].shape[0]
    if n % accum_steps != 0:
        raise ValueError(
            f"batch size {n} not divisible by accum_steps {accum_steps}"
        )
    micro = jax.tree_util.tree_map(
        lambda a: a.reshape((accum_steps, n // accum_steps) + a.shape[1:]), batch
    )
    grad_fn = jax.value_and_grad(neg_loss_fn)

    def body(carry, xs):
        acc_loss, acc_grads = carry
        mb, i = xs
        loss, grads = grad_fn(params, mb, jax.random.fold_in(key, i))
        acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
        return (acc_loss + loss, acc_grads), None

    init = (
        jnp.zeros((), jnp.float32),
        jax.tree_util.tree_map(jnp.zeros_like, params),
    )
    (loss, grads), _ = jax.lax.scan(
        body, init, (micro, jnp.arange(accum_steps))
    )
    if reduction == "mean":
        inv = 1.0 / accum_steps
        loss = loss * inv
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
    return loss, grads


def make_train_step(model, optimizer: optax.GradientTransformation, loss_fn: LossFn,
                    accum_steps: int = 1, accum_reduction: str = "mean",
                    jit: bool = True):
    """Build the fused train step: grads of -loss_fn + optax update, one jit.

    Works unchanged on a sharded ``TrainState``/batch: under GSPMD the same
    program runs data-parallel with gradient all-reduce over the mesh (see
    ``vaesne_tpu.parallel``).

    ``accum_steps > 1`` enables gradient accumulation: the batch is processed
    as that many scanned microbatches (``accumulate_gradients``) with ONE
    optimizer update, bounding activation memory when ``K × batch`` exceeds
    HBM — the trainer-level replacement for the reference's in-loss
    ``compute_microbatch_split`` (losses.py:68-76). ``accum_reduction`` must
    match the objective's batch reduction ("sum" for ``m_iwae``).

    ``jit=False`` returns the raw (untraced) step for callers that embed it
    in a larger compiled program (e.g. a ``lax.scan`` over steps — the
    bench's dispatch-free timing window; ``make_scan_epoch`` is the
    production equivalent).
    """

    def step(state: TrainState, batch) -> Tuple[TrainState, Array]:
        key, new_rng = jax.random.split(state.rng)

        def neg_objective(params, b, k):
            return -loss_fn(model, {"params": params}, b, k)

        if accum_steps == 1:
            loss, grads = jax.value_and_grad(neg_objective)(state.params, batch, key)
        else:
            loss, grads = accumulate_gradients(
                neg_objective, state.params, batch, key,
                accum_steps, accum_reduction,
            )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            opt_state=new_opt_state,
            step=state.step + 1,
            rng=new_rng,
        )
        return new_state, loss

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,))


def epoch_batches(
    key: Array,
    data,
    batch_size: int,
    shuffle: bool = True,
) -> Iterator[Any]:
    """Yield fixed-shape minibatch pytrees from device-resident arrays.

    The analog of the reference's DataLoader loop (training_util.py:36-41)
    minus the per-batch host→device copy. The trailing remainder is dropped to
    keep every step's shapes static (no XLA recompilation); with shuffling,
    every sample is still visited in expectation.
    """
    n = jax.tree_util.tree_leaves(data)[0].shape[0]
    steps = n // batch_size
    if steps == 0:
        raise ValueError(f"batch_size {batch_size} exceeds dataset size {n}")
    if shuffle:
        perm = jax.random.permutation(key, n)
    else:
        perm = jnp.arange(n)
    for i in range(steps):
        idx = perm[i * batch_size : (i + 1) * batch_size]
        yield jax.tree_util.tree_map(lambda a: a[idx], data)


def train_epoch(
    state: TrainState,
    step_fn,
    data,
    batch_size: int,
    shuffle_key: Array,
) -> Tuple[TrainState, float]:
    """One epoch over ``data``; returns (state, mean loss) — the reference's
    ``training_step`` contract (training_util.py:17-53). Per-step losses stay
    on device; the single host sync happens here, once per epoch."""
    step_losses = []
    for batch in epoch_batches(shuffle_key, data, batch_size):
        state, loss = step_fn(state, batch)
        step_losses.append(loss)
    if not step_losses:
        return state, 0.0
    return state, float(jnp.stack(step_losses).mean())


def make_scan_epoch(model, optimizer: optax.GradientTransformation,
                    loss_fn: LossFn, accum_steps: int = 1,
                    accum_reduction: str = "mean", mesh=None):
    """Build a whole-epoch train function: shuffle + every step under ONE
    ``lax.scan`` in ONE compiled program.

    The Python loop in ``train_epoch`` dispatches each minibatch step (and
    its gather) separately — fine on co-located hosts, but at the
    reference's batch sizes (16-32, e.g. test_photospectra.py:95) dispatch
    overhead dominates on remote/tunneled devices. Scanning the step is the
    XLA-native shape: data-independent control flow, one launch per epoch.

    Identical math to the loop: same permutation (from ``shuffle_key``),
    same per-step RNG chain (``state.rng`` splits), trailing remainder
    dropped. Returns ``epoch_fn(state, data, shuffle_key) -> (state,
    mean_loss)``; recompiles only if the dataset/batch geometry changes.

    ``accum_steps``/``accum_reduction`` as in ``make_train_step``: each step
    of the scanned epoch processes its batch as that many gradient-
    accumulation microbatches with one optimizer update.

    ``mesh``: a ``parallel.make_mesh`` result. Every scanned step's batch is
    sharding-constrained over the ``data`` axis, so the whole epoch runs
    data-parallel under GSPMD (gradient all-reduce over ICI) while the math
    — permutation, RNG chain, update order — is identical to the
    single-device program. The replicated-state / sharded-data placement is
    the caller's job (``train_loop`` / ``parallel.shard_data_parallel``).
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        from .parallel import DATA_AXIS

        # [steps, batch, ...]: steps stays unsharded (scan axis), the
        # per-step batch axis shards over data
        batch_sharding = NamedSharding(mesh, PartitionSpec(None, DATA_AXIS))

    def neg_loss(params, batch, key):
        return -loss_fn(model, {"params": params}, batch, key)

    def body(state: TrainState, batch):
        key, new_rng = jax.random.split(state.rng)
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(neg_loss)(state.params, batch, key)
        else:
            loss, grads = accumulate_gradients(
                neg_loss, state.params, batch, key, accum_steps, accum_reduction
            )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, opt_state=new_opt_state,
            step=state.step + 1, rng=new_rng,
        ), loss

    @functools.partial(jax.jit, static_argnames=("batch_size",), donate_argnums=(0,))
    def epoch_fn(state: TrainState, data, shuffle_key: Array, batch_size: int):
        n = jax.tree_util.tree_leaves(data)[0].shape[0]
        steps = n // batch_size
        perm = jax.random.permutation(shuffle_key, n)[: steps * batch_size]
        stacked = jax.tree_util.tree_map(
            lambda a: a[perm].reshape((steps, batch_size) + a.shape[1:]), data
        )
        if mesh is not None:
            stacked = jax.lax.with_sharding_constraint(
                stacked,
                jax.tree_util.tree_map(lambda _: batch_sharding, stacked),
            )
        state, losses = jax.lax.scan(body, state, stacked)
        return state, losses.mean()

    def run(state: TrainState, data, shuffle_key: Array, batch_size: int):
        n = jax.tree_util.tree_leaves(data)[0].shape[0]
        if n // batch_size == 0:
            raise ValueError(f"batch_size {batch_size} exceeds dataset size {n}")
        state, mean_loss = epoch_fn(state, data, shuffle_key, batch_size)
        return state, float(mean_loss)

    run.epoch_fn = epoch_fn  # the jitted whole-epoch program (lowerable)
    return run


def fit(
    state: TrainState,
    step_fn,
    data,
    batch_size: int,
    epochs: int,
    key: Array,
    callback: Optional[Callable[[int, TrainState, float], None]] = None,
):
    """Multi-epoch driver with an optional per-epoch callback (the analog of
    the reference scripts' plotting/checkpoint blocks, e.g.
    test_photospectra.py:141-154). Returns (state, losses list)."""
    losses = []
    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        state, loss = train_epoch(state, step_fn, data, batch_size, sub)
        losses.append(loss)
        if callback is not None:
            callback(epoch, state, loss)
    return state, losses
