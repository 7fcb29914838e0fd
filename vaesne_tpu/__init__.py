"""VAESNe-TPU: a TPU-native JAX framework for multimodal supernova modeling.

From-scratch rebuild of the capabilities of YunyiShen/VAESNe-dev (PyTorch,
single-GPU) as an idiomatic jit/vmap/pjit framework: per-modality transformer
VAEs over masked irregular sequences, MoE-MMVAE with K-sample IWAE
objectives and cross-modal generation, contrastive two-tower pretraining,
regression heads, fused train steps, mesh-sharded evaluation, and Pallas
kernels on the hot paths. See SURVEY.md at the repo root for the full
capability map with reference file:line citations.
"""

__version__ = "0.1.0"

import os as _os

# Opt-in persistent XLA compilation cache: first compile of the flagship
# train step is ~30-60s on TPU; with the cache set, repeated driver runs
# (sweeps, eval re-runs, resumed training) skip it entirely.
if _os.environ.get("VAESNE_COMPILE_CACHE"):
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["VAESNE_COMPILE_CACHE"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # The custom_partitioning wrappers around the Pallas kernels
    # (ops/partition.py) embed a process-local callback pointer in the
    # lowered HLO; without this flag every process computes a fresh cache
    # key and the persistent cache never hits (observed: four distinct
    # jit_step entries for the identical bench program).
    _jax.config.update(
        "jax_remove_custom_partitioning_ptr_from_cache_key", True)

from . import distributions, objectives, training
from .distributions import Laplace, Normal, kl_divergence, log_mean_exp
from .serving import InferenceServer

__all__ = [
    "distributions",
    "objectives",
    "training",
    "InferenceServer",
    "Laplace",
    "Normal",
    "kl_divergence",
    "log_mean_exp",
    "__version__",
]
