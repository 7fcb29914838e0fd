"""Checkpoint / resume: full-train-state pytree checkpoints via Orbax.

The reference saves whole-module torch pickles every 5 epochs to a single
filename with hyperparameters encoded in the name, and has no optimizer
state, step counter, or resume path (SURVEY §5.4; test_photospectra.py:153).
Here a checkpoint is the complete ``TrainState`` (params + optimizer state +
step + RNG) plus a JSON-able config dict, so training resumes bit-exactly.
The reference's name-encoding convention is kept as generated metadata for
familiarity (``checkpoint_name``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from ..training import TrainState


def checkpoint_name(
    dataset: str,
    model: str,
    latent_len: int,
    latent_dim: int,
    lr: float,
    epochs: int,
    K: Optional[int] = None,
    beta: Optional[float] = None,
    model_dim: Optional[int] = None,
    **extra,
) -> str:
    """Reference-style name:
    ``{dataset}_{model}_{len}-{dim}_{lr}_{epochs}[_K{K}][_beta{β}][_modeldim{D}]...``
    (test_photospectra.py:153, ZTF_photospect.py:137)."""
    parts = [f"{dataset}_{model}_{latent_len}-{latent_dim}_{lr}_{epochs}"]
    if K is not None:
        parts.append(f"K{K}")
    if beta is not None:
        parts.append(f"beta{beta}")
    if model_dim is not None:
        parts.append(f"modeldim{model_dim}")
    parts.extend(f"{k}{v}" for k, v in extra.items())
    return "_".join(parts)


def save_checkpoint(
    path: str, state: TrainState, config: Optional[Dict[str, Any]] = None
) -> None:
    """Save the full train state (+ config JSON) to ``path`` (a directory)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), state, force=True)
    ckptr.wait_until_finished()
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (an abstract or concrete
    TrainState with matching pytree structure/shapes).

    Checkpoint-format note: the opt_state pytree structure depends on how the
    optimizer was built — ``training.adamw`` with ``flatten=True`` (the
    default) stores AdamW moments as one concatenated vector, while
    ``flatten=False`` mirrors the param tree. A checkpoint saved under one
    setting cannot restore into a template built under the other; the
    mismatch is detected here and surfaced with the fix rather than as a raw
    Orbax tree error.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    try:
        return ckptr.restore(os.path.join(path, "state"), abstract)
    except (ValueError, KeyError) as e:
        raise ValueError(
            f"restore_checkpoint: saved state at {path!r} does not match the "
            f"template. {_diagnose_mismatch(ckptr, path, template)} "
            f"Original error: {e}"
        ) from e


def _diagnose_mismatch(ckptr, path: str, template: TrainState) -> str:
    """Distinguish a params (architecture/config) mismatch from an
    opt_state-only (optimizer flatten-format) mismatch, so the restore error
    suggests the right fix instead of always blaming the optimizer format."""
    try:
        meta = ckptr.metadata(os.path.join(path, "state"))
        saved_params = meta["params"] if isinstance(meta, dict) else meta.params
        same_structure = jax.tree_util.tree_structure(
            saved_params
        ) == jax.tree_util.tree_structure(template.params)
        if same_structure:
            shape_diffs = [
                f"{jax.tree_util.keystr(p)}: saved {tuple(a.shape)} vs "
                f"template {tuple(b.shape)}"
                for (p, a), (_, b) in zip(
                    jax.tree_util.tree_leaves_with_path(saved_params),
                    jax.tree_util.tree_leaves_with_path(template.params),
                )
                if tuple(a.shape) != tuple(b.shape)
            ]
            if shape_diffs:
                return (
                    "The params TREE matches but leaf shapes differ — the "
                    "checkpoint was trained with a different architecture "
                    "config than the template (use restore_config to rebuild "
                    "the exact config). First diffs: "
                    + "; ".join(shape_diffs[:3]) + "."
                )
            return (
                "The params subtree matches the template, so the mismatch is "
                "in opt_state: training.adamw(..., flatten=True) (the "
                "default) and flatten=False produce different opt_state "
                "structures — rebuild the template with the same flatten "
                "setting the checkpoint was saved with."
            )
        return (
            "The params subtree ITSELF differs from the template — the "
            "checkpoint holds a different model architecture or config "
            "(restore it through restore_config / the matching driver, "
            "not a default-config template)."
        )
    except Exception:  # metadata unavailable: give both possibilities
        return (
            "Could not read checkpoint metadata to localize the mismatch; "
            "either the architecture config differs from the template, or "
            "the optimizer flatten format does (training.adamw flatten=True "
            "vs False)."
        )


def load_config(path: str) -> Optional[Dict[str, Any]]:
    cfg = os.path.join(os.path.abspath(path), "config.json")
    if not os.path.exists(cfg):
        return None
    with open(cfg) as f:
        return json.load(f)


def restore_config(path: str, expected_cls=None):
    """Rebuild the experiment config a checkpoint was trained with.

    The analog of the reference's ability to ``torch.load`` any pickled
    model regardless of its hyperparameters (spect_cond_LC.py:75-82): every
    eval/try driver calls this so a checkpoint trained with non-default
    latent/model dims restores into the RIGHT architecture with no flags.

    Returns ``None`` when the checkpoint carries no ``config.json`` (the
    caller falls back to its default config — restore will then shape-error
    if the architecture actually differs). Raises when the saved
    ``_config_class`` tag conflicts with ``expected_cls`` — evaluating, say,
    a contrastive checkpoint as an MMVAE is a user error to surface, not
    silently mis-evaluate.
    """
    d = load_config(path)
    if d is None:
        return None
    from .config import CONFIG_CLASSES, from_dict

    name = d.get("_config_class")
    cls = CONFIG_CLASSES.get(name) if name else None
    if expected_cls is not None:
        if cls is not None and cls is not expected_cls:
            raise ValueError(
                f"checkpoint at {path!r} was trained as {name}, but this "
                f"driver expects {expected_cls.__name__}"
            )
        cls = expected_cls
    if cls is None:
        raise ValueError(
            f"checkpoint config at {path!r} has unknown _config_class "
            f"{name!r}; pass the matching driver or re-save the config"
        )
    return from_dict(cls, d)
