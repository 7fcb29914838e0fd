"""Data pipelines: npz contract loaders, on-device augmentation, synthetic
Goldstein/ZTF-shaped generators, and image utilities."""

from .augment import (
    affine_warp,
    augment_images,
    augment_multimodal,
    augment_photometry,
    augment_spectra,
    random_affine,
    repeat_dataset,
)
from .goldstein import (
    denormalize,
    get_goldstein_params,
    goldstein_labels,
    load_npz,
    multimodal_tuple,
    photometry_tuple,
    spectra_tuple,
    train_test_split,
)
from .images import ImagePathDataset, image_tuple
from .validate import validate_npz
from .synthetic import (
    LSST_BANDS,
    PHOTOMETRY_LENGTH,
    SPECTRUM_BINS,
    ZTF_BANDS,
    make_goldstein_like,
    make_images,
    make_ztf_like,
)

__all__ = [
    "affine_warp",
    "augment_images",
    "augment_multimodal",
    "augment_photometry",
    "augment_spectra",
    "random_affine",
    "repeat_dataset",
    "denormalize",
    "get_goldstein_params",
    "goldstein_labels",
    "load_npz",
    "multimodal_tuple",
    "photometry_tuple",
    "spectra_tuple",
    "train_test_split",
    "ImagePathDataset",
    "image_tuple",
    "validate_npz",
    "make_goldstein_like",
    "make_images",
    "make_ztf_like",
    "LSST_BANDS",
    "PHOTOMETRY_LENGTH",
    "SPECTRUM_BINS",
    "ZTF_BANDS",
]
