"""Model zoo: modality VAEs, MoE-MMVAE, contrastive towers, regression heads."""

from .base_vae import BaseVAE, tile_leading
from .photometric import BrightPhotometricVAE, PhotometricVAE
from .spectra import BrightSpectraVAE, SpectraVAE
from .image import HostImgVAE
from .mmvae import GOLDSTEIN_LENGTH_RATIO, MMVAE, PhotoSpecMMVAE
from .contrastive import ContraPhotSpec
from .regression import (
    ContraPhotoRegressionHead,
    ContraSpecRegressionHead,
    PhotoEnd2EndRegression,
    SpecEnd2EndRegression,
    VAERegressionHead,
)

__all__ = [
    "BaseVAE",
    "tile_leading",
    "PhotometricVAE",
    "BrightPhotometricVAE",
    "SpectraVAE",
    "BrightSpectraVAE",
    "HostImgVAE",
    "MMVAE",
    "PhotoSpecMMVAE",
    "GOLDSTEIN_LENGTH_RATIO",
    "ContraPhotSpec",
    "ContraPhotoRegressionHead",
    "ContraSpecRegressionHead",
    "PhotoEnd2EndRegression",
    "SpecEnd2EndRegression",
    "VAERegressionHead",
]
