"""Goldstein/ZTF npz loading into device-resident, fixed-shape batch tuples.

The reference loads the npz on host and copies tuple-by-tuple to the GPU every
batch (training_util.py:39-41). TPU-native: the whole standardized dataset is
placed in HBM once (it is tiny — a few hundred MB at most), and minibatches
are device-side gathers, so the input pipeline costs ~nothing per step.

Contract (test_photospectra.py:22-78):
  spectra tuple    = (flux [N,982] f32, wavelength [N,982] f32,
                      phase [N] f32, mask [N,982] bool)   True == missing
  photometry tuple = (flux [N,60] f32, time [N,60] f32,
                      band [N,60] i32, mask [N,60] bool)
  stored masks use 1 == observed → converted here via ``stored == 0``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

Batch = Tuple

GOLDSTEIN_KEYS = (
    "training_idx", "testing_idx", "flux", "wavelength", "mask", "phase",
    "photoflux", "phototime", "photomask", "photowavelength", "identity",
)


def load_npz(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as f:
        return {k: f[k] for k in f.files}


def spectra_tuple(data: Dict[str, np.ndarray], idx: Optional[np.ndarray] = None) -> Batch:
    """Build the spectra modality tuple; converts the stored mask convention."""
    sl = slice(None) if idx is None else idx
    return (
        jnp.asarray(data["flux"][sl], jnp.float32),
        jnp.asarray(data["wavelength"][sl], jnp.float32),
        jnp.asarray(data["phase"][sl], jnp.float32),
        jnp.asarray(data["mask"][sl] == 0),
    )


def photometry_tuple(data: Dict[str, np.ndarray], idx: Optional[np.ndarray] = None) -> Batch:
    sl = slice(None) if idx is None else idx
    return (
        jnp.asarray(data["photoflux"][sl], jnp.float32),
        jnp.asarray(data["phototime"][sl], jnp.float32),
        jnp.asarray(data["photowavelength"][sl], jnp.int32),
        jnp.asarray(data["photomask"][sl] == 0),
    )


def multimodal_tuple(data: Dict[str, np.ndarray], idx: Optional[np.ndarray] = None) -> Batch:
    """(photometry, spectra) — the MMVAE modality order (mmVAE.py:133:
    vaes = [photo, spectra])."""
    return (photometry_tuple(data, idx), spectra_tuple(data, idx))


def train_test_split(data: Dict[str, np.ndarray]):
    """(train_idx, test_idx) from the stored split."""
    return np.asarray(data["training_idx"]), np.asarray(data["testing_idx"])


def denormalize(a, mean, std):
    """Undo standardization for metrics in physical units
    (spect_cond_LC.py:114-137 multiplies std and adds mean back)."""
    return a * std + mean


import re

_SCI_FLOAT = re.compile(r"[-+]?\d*\.\d+e[-+]?\d+")


def get_goldstein_params(filename: str) -> np.ndarray:
    """Parse the physical simulation parameters out of a Goldstein filename.

    The reference smuggles the 4 Goldstein parameters through the data
    filenames as scientific-notation floats and regex-parses them back
    (data_util.py:76-79; used on ``data['identity']`` at
    photometry2goldstein_mmvae.py:24-25)."""
    return np.array([float(v) for v in _SCI_FLOAT.findall(str(filename))])


def goldstein_labels(data: Dict[str, np.ndarray],
                     idx: Optional[np.ndarray] = None) -> np.ndarray:
    """[N, P] float32 label matrix parsed from ``data['identity']`` filenames,
    with the reference's per-column standardization left to the caller
    (photometry2goldstein_mmvae.py:36-40)."""
    ids = data["identity"] if idx is None else data["identity"][idx]
    return np.stack([get_goldstein_params(i) for i in ids]).astype(np.float32)
