"""Utilities: checkpointing, plotting, experiment configs, profiling."""

from .checkpoint import (
    checkpoint_name,
    load_config,
    restore_checkpoint,
    save_checkpoint,
)
from .config import (
    ContrastiveConfig,
    ImageVAEConfig,
    ModelConfig,
    PhotoSpectraMMVAEConfig,
    PhotometryVAEConfig,
    RegressionConfig,
    SpectraVAEConfig,
    TrainConfig,
    ZTFMMVAEConfig,
    asdict,
    parse_overrides,
)
from .profiling import StepTimer, timed_steps, trace
from .plotting import (plot_loss_curve, plot_lsst_lc, plot_metric_grid,
                       plot_spectra_samples)

__all__ = [
    "checkpoint_name",
    "load_config",
    "restore_checkpoint",
    "save_checkpoint",
    "ContrastiveConfig",
    "ImageVAEConfig",
    "ModelConfig",
    "PhotoSpectraMMVAEConfig",
    "PhotometryVAEConfig",
    "RegressionConfig",
    "SpectraVAEConfig",
    "TrainConfig",
    "ZTFMMVAEConfig",
    "asdict",
    "parse_overrides",
    "StepTimer",
    "timed_steps",
    "trace",
    "plot_loss_curve",
    "plot_metric_grid",
    "plot_lsst_lc",
    "plot_spectra_samples",
]
