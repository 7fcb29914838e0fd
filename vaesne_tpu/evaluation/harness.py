"""Quantitative evaluation harness: one sharded device pass, no job arrays.

Capability mirrored from reference ``cannon/test/goldstein/``:
  * ``spect_cond_LC.py`` — full-test-set K=100 reconstructions (self + cross
    modal + unimodal baselines), denormalized, written as npz shards by a
    400-job SLURM array (spect_cond_LC.sh ``--array=0-399``)
  * ``evaluation.py``    — shard aggregation → ``avg_metrics.npz``
  * ``gradual_masking.py`` — robustness sweep masking 0–90 % of the light
    curve before cross-modal spectra reconstruction
  * ``eval_paramregression.py`` — |error|/σ for the regression heads

TPU-native design: the test set is chunked with static shapes and each chunk's
(encode → K-sample decode) runs as one jitted program, optionally sharded over
the data mesh — the whole 400-job array collapses into a single pass
(SURVEY §2.4 row "Multi-job sharding").
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import make_mesh, shard_batch
from .metrics import PHASE_BUCKETS, aggregate_metrics

Array = jax.Array


def _pad_to_multiple(tree, multiple: int):
    """Pad the batch axis up to a multiple (edge-repeat) for static chunking;
    returns (padded_tree, original_n)."""
    n = jax.tree_util.tree_leaves(tree)[0].shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return tree, n

    def pad(a):
        reps = jnp.repeat(a[-1:], rem, axis=0)
        return jnp.concatenate([a, reps], axis=0)

    return jax.tree_util.tree_map(pad, tree), n


def batched_apply(
    fn: Callable,
    data,
    chunk_size: int,
    out_axes=0,
    mesh=None,
    unpad_to: Optional[int] = None,
    key: Optional[Array] = None,
):
    """Run ``fn`` over the test set in fixed-shape chunks and concatenate each
    output leaf on its declared batch axis.

    ``out_axes`` states explicitly where the chunk batch axis sits in fn's
    outputs: an int applied to every leaf (0 for plain ``[chunk, ...]``
    outputs, 1 for K-sample ``[K, chunk, ...]`` outputs), or a pytree of ints
    matching fn's output structure for mixed cases. No shape guessing —
    declared is checked against the actual leaf.

    ``key``: when given, fn is called as ``fn(chunk, chunk_key)`` with
    ``chunk_key = fold_in(key, chunk_index)`` so every chunk draws an
    INDEPENDENT sample stream (K-sample CIs must not be correlated across
    the test set)."""
    padded, n = _pad_to_multiple(data, chunk_size)
    total = jax.tree_util.tree_leaves(padded)[0].shape[0]
    outs = []
    for ci, i in enumerate(range(0, total, chunk_size)):
        chunk = jax.tree_util.tree_map(lambda a: a[i : i + chunk_size], padded)
        if mesh is not None:
            chunk = shard_batch(chunk, mesh)
        if key is None:
            outs.append(fn(chunk))
        else:
            outs.append(fn(chunk, jax.random.fold_in(key, ci)))

    if isinstance(out_axes, int):
        treedef = jax.tree_util.tree_structure(outs[0])
        out_axes = jax.tree_util.tree_unflatten(
            treedef, [out_axes] * treedef.num_leaves
        )

    def cat(axis, *leaves):
        if leaves[0].shape[axis] != chunk_size:
            raise ValueError(
                f"batched_apply: out_axes declares batch axis {axis}, but "
                f"output leaf has shape {leaves[0].shape} with "
                f"size {leaves[0].shape[axis]} there (chunk_size="
                f"{chunk_size})"
            )
        out = jnp.concatenate(leaves, axis=axis)
        limit = n if unpad_to is None else unpad_to
        return jax.lax.slice_in_dim(out, 0, limit, axis=axis)

    return jax.tree_util.tree_map(cat, out_axes, *outs)


def mmvae_reconstruction_suite(
    mm_model,
    mm_variables,
    test_batch,  # (photometry tuple, spectra tuple), full test set
    K: int = 100,
    chunk_size: int = 64,
    key: Optional[Array] = None,
    mesh=None,
    photo_only=None,  # optional (model, variables) unimodal baselines
    spec_only=None,
    norm: Optional[Dict[str, float]] = None,
    predictive: bool = False,
) -> Dict[str, np.ndarray]:
    """Compute the full spect_cond_LC.py output table in one pass.

    Returns the reference's npz-shard key layout (spect_cond_LC.py:114-137):
    LC2LC / spec2LC / LC2spec / spec2spec (+ LConly/speconly when the
    unimodal baselines are given, LCencode/specencode posterior means), all
    denormalized when ``norm`` provides {flux,photoflux}_mean/std.

    ``predictive=False`` reproduces the reference semantics exactly: every
    recon cell holds K decoder MEANS, whose spread is latent-only (the
    coverage of that band is uncalibratable — PARITY.md "CI coverage").
    ``predictive=True`` samples each draw from the observed-point
    likelihood instead, so downstream coverage metrics evaluate the model's
    actual predictive band.
    """
    if key is None:
        key = jax.random.PRNGKey(0)

    # One jitted program per chunk shape: M×M recon matrix + posterior
    # means. Per-chunk keys come from batched_apply's fold_in so posterior
    # noise is independent across chunks.
    @jax.jit
    def full_chunk(chunk, chunk_key):
        out = {}
        recons = mm_model.apply(
            mm_variables, chunk, K, predictive=predictive,
            method="reconstruct", rngs={"sample": chunk_key}
        )
        out["LC2LC"] = recons[0][0]
        out["LC2spec"] = recons[0][1]
        out["spec2LC"] = recons[1][0]
        out["spec2spec"] = recons[1][1]
        out["LCencode"] = mm_model.apply(
            mm_variables, method=lambda m: m.vaes[0].encode(chunk[0], True)
        )
        out["specencode"] = mm_model.apply(
            mm_variables, method=lambda m: m.vaes[1].encode(chunk[1], True)
        )
        return out

    # recon cells are [K, chunk, ...]; posterior means are [chunk, ...]
    axes = {"LC2LC": 1, "LC2spec": 1, "spec2LC": 1, "spec2spec": 1,
            "LCencode": 0, "specencode": 0}
    results = batched_apply(full_chunk, test_batch, chunk_size,
                            out_axes=axes, mesh=mesh, key=key)
    results = {k: np.asarray(v) for k, v in results.items()}

    if photo_only is not None:
        pm, pv = photo_only
        f = jax.jit(
            lambda chunk, k: pm.apply(pv, chunk, K, predictive=predictive,
                                      method="reconstruct",
                                      rngs={"sample": k})
        )
        results["LConly"] = np.asarray(
            batched_apply(f, test_batch[0], chunk_size, out_axes=1,
                          mesh=mesh, key=jax.random.fold_in(key, 1))
        )
    if spec_only is not None:
        sm, sv = spec_only
        f = jax.jit(
            lambda chunk, k: sm.apply(sv, chunk, K, predictive=predictive,
                                      method="reconstruct",
                                      rngs={"sample": k})
        )
        results["speconly"] = np.asarray(
            batched_apply(f, test_batch[1], chunk_size, out_axes=1,
                          mesh=mesh, key=jax.random.fold_in(key, 2))
        )

    if norm:
        # spectra-valued outputs → flux stats; LC-valued → photoflux stats;
        # posterior means stay raw (spect_cond_LC.py:128-136)
        for k in ("LC2spec", "spec2spec", "speconly"):
            if k in results:
                results[k] = results[k] * norm.get("flux_std", 1.0) + norm.get(
                    "flux_mean", 0.0
                )
        for k in ("LC2LC", "spec2LC", "LConly"):
            if k in results:
                results[k] = results[k] * norm.get("photoflux_std", 1.0) + norm.get(
                    "photoflux_mean", 0.0
                )
    return results


def evaluate_mmvae(
    mm_model,
    mm_variables,
    test_batch,
    phase_physical: np.ndarray,
    gt_spectra: np.ndarray,
    gt_photometry: Optional[np.ndarray] = None,
    K: int = 100,
    chunk_size: int = 64,
    key: Optional[Array] = None,
    mesh=None,
    spec_only=None,
    recs: Optional[Dict[str, np.ndarray]] = None,
    predictive: bool = False,
) -> Dict[str, np.ndarray]:
    """End-to-end: reconstructions → per-phase residual/coverage/width/MSE,
    the single-pass equivalent of spect_cond_LC.py + evaluation.py.
    ``gt_*`` are in the same (physical or normalized) units as the recons.
    Pass ``recs`` (a prior ``mmvae_reconstruction_suite`` result) to skip
    recomputing the inference pass. ``predictive=True`` computes the
    coverage/width metrics over predictive draws (likelihood noise
    included) instead of the reference's latent-only decoder means."""
    if recs is None:
        recs = mmvae_reconstruction_suite(
            mm_model, mm_variables, test_batch, K=K, chunk_size=chunk_size,
            key=key, mesh=mesh, spec_only=spec_only, predictive=predictive,
        )
    sets = {"mm": recs["LC2spec"]}
    gts = {"mm": gt_spectra}
    if "speconly" in recs:
        sets["speconly"] = recs["speconly"]
        gts["speconly"] = gt_spectra
    return aggregate_metrics(sets, gts, phase_physical)


def masking_sweep(
    mm_model,
    mm_variables,
    test_batch,
    missing_portions: Sequence[float] = (0.0, 0.1, 0.3, 0.5, 0.7, 0.9),
    K: int = 100,
    key: Optional[Array] = None,
    chunk_size: int = 32,
    mesh=None,
) -> Dict[float, np.ndarray]:
    """Robustness to light-curve masking (gradual_masking.py:67-114): flip an
    extra ``missing`` fraction of *observed* LC points to masked, then
    cross-reconstruct spectra (LC→spec). Returns {portion: [K, B, N]}.

    Runs in fixed-shape chunks: K*B at K=100 over a whole test set in one
    program exceeds single-chip HBM. ``mesh`` shards each chunk's event axis
    over the ``data`` mesh axis (one SPMD pass, like the reconstruction
    suite — the sweep's chunks ride all chips instead of chip 0)."""
    if key is None:
        key = jax.random.PRNGKey(42)  # gradual_masking.py:83 uses seed 42
    photo, spec = test_batch
    flux, time, band, mask = photo
    out = {}
    recon = jax.jit(
        lambda batch, k: mm_model.apply(
            mm_variables, batch, K, method="reconstruct", rngs={"sample": k}
        )[0][1]
    )
    for i, missing in enumerate(missing_portions):
        k_flip, k_rec = jax.random.split(jax.random.fold_in(key, i))
        observed = ~mask
        flip = jnp.logical_and(
            observed, jax.random.uniform(k_flip, mask.shape) < missing
        )
        masked_photo = (flux, time, band, jnp.logical_or(mask, flip))
        # out_axes=1: LC→spec recon is [K, chunk, bins]; per-chunk keys
        # folded in by batched_apply (independent CI noise per chunk)
        out[float(missing)] = np.asarray(batched_apply(
            recon, (masked_photo, spec), chunk_size, out_axes=1, key=k_rec,
            mesh=mesh,
        ))
    return out
