"""Tensor-parallel (model-axis) parameter sharding.

The reference has no model parallelism (SURVEY §2.4: models are ~10⁵–10⁶
params, single GPU), so at reference sizes the ``model`` mesh axis is a
no-op. This module makes the axis REAL for scaled-up configs: Megatron-style
head/feed-forward sharding expressed as ``PartitionSpec``s over the flax
param tree, with XLA GSPMD inserting the collectives:

- attention ``q/k/v_proj``: output (head) axis sharded → each model shard
  computes its own subset of heads end-to-end (per-head softmax is local);
- attention ``out_proj`` and ``ffn_2``: contraction axis sharded → one
  ``psum`` (all-reduce over ICI) restores the replicated activation;
- ``ffn_0``: hidden axis sharded (pairs with ``ffn_2``);
- everything else (layernorms, embeddings, heads, bottleneck tokens):
  replicated.

Divisibility contract (what is actually checked): every sharded TENSOR
dimension — q/k/v/ffn_0 output axes (``embed_dim`` / ``ff_dim``) and
out_proj/ffn_2 contraction axes — must be divisible by the model-axis size.
Param shapes alone cannot reveal ``num_heads``, so the per-head-locality
design premise (heads not split mid-head, keeping per-head softmax local)
is only validated when the caller passes ``num_heads=`` to
``shard_params_tp``/``shard_state_tp``; without it, a mid-head split is
still numerically correct under GSPMD but costs extra collectives.
Optimizer state is sharded congruently with its parameters
(``optax.tree_map_params``), so per-shard AdamW touches only local moments.

NB the fused Pallas attention kernel (ops/attention.py) partitions over
the model axis too: its ``custom_partitioning`` registration keeps
whole-head (packed-E-axis) sharding, so each model shard runs its own
heads through the kernel locally — matching the q/k/v column sharding
above with no gather (``ops/partition.py``; whole-head splits only —
``num_heads % model_axis == 0``, the same contract ``shard_params_tp``
enforces). The in-kernel dropout bit-stream is seeded per head SHARD, so
a tp>1 run draws different (equally valid) attention-dropout masks than
the identical single-chip run; eval/deterministic results are exact.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS, replicated

# param-tree path fragments → (kernel spec, bias spec); kernels are
# [in, out], biases [out]
_COL_SHARDED = ("q_proj", "k_proj", "v_proj", "ffn_0")  # shard output axis
_ROW_SHARDED = ("out_proj", "ffn_2")  # shard contraction axis, psum after


def _spec_for(path, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    for frag in _COL_SHARDED:
        if frag in names:
            return P(None, MODEL_AXIS) if leaf.ndim == 2 else P(MODEL_AXIS)
    for frag in _ROW_SHARDED:
        if frag in names:
            # bias adds AFTER the contraction psum → replicated
            return P(MODEL_AXIS, None) if leaf.ndim == 2 else P()
    return P()


def tensor_parallel_specs(params: Any) -> Any:
    """PartitionSpec tree (same structure as ``params``) for model-axis TP."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def _as_shardings(spec_tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda s: isinstance(s, P),
    )


def shard_params_tp(params: Any, mesh: Mesh, num_heads: int | None = None) -> Any:
    """Place ``params`` with attention/FFN weights split over ``model``.

    Pass ``num_heads`` (from the module config) to additionally enforce
    ``num_heads % model_axis == 0`` — the head-locality premise that tensor
    shapes alone cannot verify (see module docstring)."""
    _check_divisibility(params, mesh, num_heads=num_heads)
    return jax.tree_util.tree_map(
        jax.device_put, params, _as_shardings(tensor_parallel_specs(params), mesh)
    )


def shard_state_tp(state: Any, optimizer: optax.GradientTransformation,
                   mesh: Mesh, num_heads: int | None = None) -> Any:
    """Place a ``TrainState`` for dp×tp: params via ``shard_params_tp``,
    optimizer moments congruent with their params, step/rng replicated.

    Requires an optimizer whose state mirrors the param tree — build it with
    ``training.adamw(..., flatten=False)`` (the flattened default stores
    moments as one concatenated vector, which cannot carry per-param
    partition specs)."""
    _check_divisibility(state.params, mesh, num_heads=num_heads)
    param_sh = _as_shardings(tensor_parallel_specs(state.params), mesh)
    try:
        opt_sh = optax.tree_map_params(
            optimizer,
            lambda _, sh: sh,
            state.opt_state,
            param_sh,
            transform_non_params=lambda _: replicated(mesh),
            is_leaf=lambda x: isinstance(x, NamedSharding),
        )
    except (ValueError, TypeError) as e:
        raise ValueError(
            "shard_state_tp: optimizer state does not mirror the param tree "
            "(a flattened optimizer?). Build it with "
            "training.adamw(..., flatten=False)."
        ) from e
    state_sh = state.replace(
        params=param_sh,
        opt_state=opt_sh,
        step=replicated(mesh),
        rng=replicated(mesh),
    )
    return jax.tree_util.tree_map(jax.device_put, state, state_sh)


def _check_divisibility(params: Any, mesh: Mesh,
                        num_heads: int | None = None) -> None:
    m = mesh.shape[MODEL_AXIS]
    if m == 1:
        return
    if num_heads is not None and num_heads % m != 0:
        raise ValueError(
            f"num_heads ({num_heads}) not divisible by model axis {m}: "
            "q/k/v shards would split mid-head, breaking per-head softmax "
            "locality (extra collectives under GSPMD)"
        )

    def check(path, leaf):
        spec = _spec_for(path, leaf)
        for axis, name in enumerate(spec):
            if name == MODEL_AXIS and leaf.shape[axis] % m != 0:
                raise ValueError(
                    f"param {jax.tree_util.keystr(path)} axis {axis} "
                    f"({leaf.shape[axis]}) not divisible by model axis {m}"
                )

    jax.tree_util.tree_map_with_path(check, params)
