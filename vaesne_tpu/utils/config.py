"""Experiment configuration: one dataclass per reference cannon script.

The reference hardcodes hyperparameters as module-level constants in each
driver script and additionally smuggles config through checkpoint filenames
(SURVEY §5.6). Here every anchor configuration (BASELINE.md "Anchor
configurations") is a frozen dataclass with CLI overrides via
``parse_overrides`` — e.g. ``python -m ... lr=1e-3 epochs=50``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Shared transformer-VAE hyperparameters."""

    latent_len: int = 4
    latent_dim: int = 4
    model_dim: int = 32
    num_heads: int = 4
    ff_dim: int = 32
    num_layers: int = 4
    dropout: float = 0.1
    selfattn: bool = False
    concat: bool = True
    # Bright* variants: decoder-mean recentering to a brightness head
    # (reference SpectraVAE.py:211 / PhotometricVAE.py:226, imported by the
    # flagship + ZTF scripts). Applies to every driver whose model has a
    # Bright form (spectra/photometry/MMVAE/ZTF).
    bright: bool = False


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 2.5e-4
    epochs: int = 200
    batch_size: int = 32
    seed: int = 0
    K: int = 1
    beta: float = 1.0
    save_every: int = 5  # reference checkpoints every 5 epochs
    # run each epoch's steps under one lax.scan (one dispatch/epoch);
    # False falls back to the per-batch Python loop
    scan_epoch: bool = True
    # device mesh for this run (parallel.resolve_mesh): "auto" = all chips
    # data-parallel (single-device when only one chip), "none" = force one
    # device, "4" = 4-chip DP, "4x2" = DP x Megatron-TP
    mesh: str = "auto"
    ckpt_dir: str = "./ckpt"
    log_dir: str = "./logs"
    # --- optimizer (torch AdamW defaults; reference e.g. test_photospectra
    # .py:135 uses bare torch.optim.AdamW) -------------------------------
    weight_decay: float = 1e-2
    b1: float = 0.9
    b2: float = 0.999
    # global-norm clip ahead of AdamW; <= 0 disables (reference dynamics
    # have NO clipping — see training.adamw docstring)
    grad_clip: float = 10.0
    # --- gradient accumulation (trainer-level replacement for the
    # reference's compute_microbatch_split, losses.py:68-76) -------------
    accum_steps: int = 1
    accum_reduction: str = "mean"  # "sum" for batch-sum objectives (m_iwae)
    # --- resume: continue bit-exactly from this run's checkpoint dir ----
    resume: bool = False
    # --- parity preset: reference training dynamics (grad_clip off +
    # one-shot augmentation instead of fresh per-epoch draws) ------------
    parity: bool = False


@dataclass(frozen=True)
class PhotometryVAEConfig:
    """Goldstein photometry VAE (test_photometry.py:55-70)."""

    model: ModelConfig = field(default_factory=lambda: ModelConfig(
        latent_len=4, latent_dim=2, model_dim=32, ff_dim=32))
    train: TrainConfig = field(default_factory=lambda: TrainConfig(
        lr=2.5e-4, epochs=200, batch_size=32, beta=0.5))
    num_bands: int = 6


@dataclass(frozen=True)
class SpectraVAEConfig:
    """Goldstein spectra VAE (test_spectra.py:57-77)."""

    model: ModelConfig = field(default_factory=lambda: ModelConfig(
        latent_len=4, latent_dim=4, model_dim=32, ff_dim=32))
    train: TrainConfig = field(default_factory=lambda: TrainConfig(
        lr=2.5e-4, epochs=200, batch_size=32, beta=1.0))


@dataclass(frozen=True)
class PhotoSpectraMMVAEConfig:
    """Goldstein photo+spectra MoE-MMVAE — the flagship config
    (test_photospectra.py:93-144)."""

    model: ModelConfig = field(default_factory=lambda: ModelConfig(
        latent_len=4, latent_dim=4, model_dim=32, ff_dim=32))
    # accum_reduction="sum": m_iwae sums over the batch, so accumulated
    # microbatch grads must sum for whole-batch equivalence
    train: TrainConfig = field(default_factory=lambda: TrainConfig(
        lr=1e-4, epochs=200, batch_size=16, K=2, beta=1.0,
        accum_reduction="sum"))
    num_bands: int = 6


@dataclass(frozen=True)
class ContrastiveConfig:
    """Goldstein contrastive two-tower (test_photospectra_contrast.py:92-127)."""

    model: ModelConfig = field(default_factory=lambda: ModelConfig(
        latent_len=4, latent_dim=4, model_dim=32, ff_dim=32))
    train: TrainConfig = field(default_factory=lambda: TrainConfig(
        lr=2.5e-4, epochs=500, batch_size=32))
    proj_dim: int = 8
    temperature: float = 0.1
    num_bands: int = 6


@dataclass(frozen=True)
class ZTFMMVAEConfig:
    """ZTF photo+spectra MMVAE (ZTF_photospect.py:78-128)."""

    model: ModelConfig = field(default_factory=lambda: ModelConfig(
        latent_len=4, latent_dim=4, model_dim=32, ff_dim=32))
    train: TrainConfig = field(default_factory=lambda: TrainConfig(
        lr=1e-3, epochs=200, batch_size=32, K=8, beta=0.5,
        accum_reduction="sum"))
    num_bands: int = 2
    repeat_factor: int = 10  # ZTF ×10 repeat augmentation


@dataclass(frozen=True)
class ZTFSpectraConfig:
    """ZTF spectra-only VAE (ZTF_spectonly.py:48-69)."""

    model: ModelConfig = field(default_factory=lambda: ModelConfig(
        latent_len=4, latent_dim=4, model_dim=32, ff_dim=32))
    train: TrainConfig = field(default_factory=lambda: TrainConfig(
        lr=1e-3, epochs=200, batch_size=32, beta=0.5))
    repeat_factor: int = 10
    extra_mask_prob: float = 0.075  # ZTF uses 5-10% (ZTF_spectonly.py:39)


@dataclass(frozen=True)
class ImageVAEConfig:
    """ZTF host-image VAE (test_ZTFimage.py:44-70) / MNIST smoke (mnist.py)."""

    img_size: int = 60
    patch_size: int = 2
    in_channels: int = 3
    hybrid: bool = True
    focal_loc: bool = False
    model: ModelConfig = field(default_factory=lambda: ModelConfig(
        latent_len=4, latent_dim=4, model_dim=32, ff_dim=32))
    train: TrainConfig = field(default_factory=lambda: TrainConfig(
        lr=1e-3, epochs=150, batch_size=32, beta=0.5))
    aug_factor: int = 5


@dataclass(frozen=True)
class RegressionConfig:
    """Goldstein parameter regression (photometry2goldstein_*.py)."""

    outdim: int = 4
    mlp_hidden: Tuple[int, ...] = (128, 128, 128, 128)
    train: TrainConfig = field(default_factory=lambda: TrainConfig(
        lr=1e-3, epochs=100, batch_size=32))


def parse_overrides(cfg, argv: Sequence[str]):
    """Apply ``key=value`` / ``section.key=value`` CLI overrides to a
    (nested) frozen dataclass, with type coercion from the field default."""
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"override must be key=value, got {arg!r}")
        dotted, raw = arg.split("=", 1)
        cfg = _override(cfg, dotted.split("."), raw)
    return cfg


def _coerce(raw: str, current: Any) -> Any:
    if isinstance(current, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(current, int):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    return raw


def _override(cfg, path, raw):
    name, rest = path[0], path[1:]
    current = getattr(cfg, name)
    if rest:
        return dataclasses.replace(cfg, **{name: _override(current, rest, raw)})
    return dataclasses.replace(cfg, **{name: _coerce(raw, current)})


def asdict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def from_dict(cls, d: Dict[str, Any]):
    """Rebuild a (nested) config dataclass from ``asdict`` output — the
    checkpoint ``config.json`` round-trip. Unknown/underscore keys are
    ignored (forward compatibility); nested dataclass fields recurse; lists
    become tuples (JSON has no tuples)."""
    import typing

    hints = typing.get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        hint = hints.get(f.name)
        if dataclasses.is_dataclass(hint) and isinstance(v, dict):
            v = from_dict(hint, v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


# registry for checkpoint config.json round-trips (utils.checkpoint.
# restore_config): the saved ``_config_class`` tag dispatches here
CONFIG_CLASSES = {
    c.__name__: c
    for c in (
        PhotometryVAEConfig,
        SpectraVAEConfig,
        PhotoSpectraMMVAEConfig,
        ContrastiveConfig,
        ZTFMMVAEConfig,
        ZTFSpectraConfig,
        ImageVAEConfig,
        RegressionConfig,
    )
}
