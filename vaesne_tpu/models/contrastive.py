"""CLIP-style contrastive two-tower network for photometry ↔ spectra.

Capability mirrored from reference ``contrastiveNets.py``:
  * ``ContraPhotSpec`` (contrastiveNets.py:20-101): a photometric encoder and
    a spectra encoder (the same perceiver towers the VAEs use, with
    ``bottleneck_length = latent_len`` — no mu/var split), each followed by a
    single-hidden-layer projection head latent_len·latent_dim → proj_dim.

``__call__`` returns both projections; the InfoNCE objective lives in
``vaesne_tpu.objectives.neg_info_nce``. ``photo_enc``/``spectra_enc`` expose
the frozen-tower embeddings for downstream regression heads
(contrastiveNets.py:91-101).
"""

from __future__ import annotations

import jax
from flax import linen as nn

from ..nn.layers import SingleLayerMLP
from ..nn.photometric_layers import PhotometricTransformerEncoder
from ..nn.spectra_layers import SpectraTransformerEncoder

Array = jax.Array


class ContraPhotSpec(nn.Module):
    latent_len: int = 4
    latent_dim: int = 4
    proj_dim: int = 8
    # photometric tower
    num_bands: int = 6
    photo_model_dim: int = 32
    photo_num_heads: int = 4
    photo_ff_dim: int = 32
    photo_num_layers: int = 4
    photo_dropout: float = 0.1
    # spectra tower
    spec_model_dim: int = 32
    spec_num_heads: int = 4
    spec_num_layers: int = 4
    spec_ff_dim: int = 32
    spec_dropout: float = 0.1
    selfattn: bool = False

    def setup(self):
        self.photometry_encoder = PhotometricTransformerEncoder(
            num_bands=self.num_bands,
            bottleneck_length=self.latent_len,
            bottleneck_dim=self.latent_dim,
            model_dim=self.photo_model_dim,
            num_heads=self.photo_num_heads,
            ff_dim=self.photo_ff_dim,
            num_layers=self.photo_num_layers,
            dropout=self.photo_dropout,
            selfattn=self.selfattn,
        )
        self.photo_proj = SingleLayerMLP(self.proj_dim)
        self.spectra_encoder = SpectraTransformerEncoder(
            bottleneck_length=self.latent_len,
            bottleneck_dim=self.latent_dim,
            model_dim=self.spec_model_dim,
            num_heads=self.spec_num_heads,
            num_layers=self.spec_num_layers,
            ff_dim=self.spec_ff_dim,
            dropout=self.spec_dropout,
            selfattn=self.selfattn,
        )
        self.spectra_proj = SingleLayerMLP(self.proj_dim)

    def __call__(self, x, deterministic: bool = True):
        """x = (photometry tuple, spectra tuple) → (z1 [B,proj], z2 [B,proj])."""
        photo_flux, time, band, photo_mask = x[0]
        spec_flux, wavelength, phase, spec_mask = x[1]
        z1 = self.photometry_encoder(
            photo_flux, time, band, photo_mask, deterministic=deterministic
        )
        # NB deliberate swap (see models/spectra.py:_enc_params): the
        # reference feeds (flux, wavelength) positionally into
        # spectraTransformerEncoder.forward(wavelength, flux, ...) — its
        # exercised behavior routes wavelength through the linear path and
        # flux through the sinusoid; reproduced for golden parity.
        z2 = self.spectra_encoder(
            wavelength, spec_flux, phase, spec_mask, deterministic=deterministic
        )
        z1 = self.photo_proj(z1.reshape(z1.shape[0], -1))
        z2 = self.spectra_proj(z2.reshape(z2.shape[0], -1))
        return z1, z2

    def photo_enc(self, x) -> Array:
        """Frozen-eval photometric tower embedding [B, latent_len, latent_dim]."""
        photo_flux, time, band, photo_mask = x
        return self.photometry_encoder(photo_flux, time, band, photo_mask, deterministic=True)

    def spectra_enc(self, x) -> Array:
        """Frozen-eval spectra tower embedding [B, latent_len, latent_dim]."""
        spec_flux, wavelength, phase, spec_mask = x
        # deliberate swap — see __call__
        return self.spectra_encoder(wavelength, spec_flux, phase, spec_mask, deterministic=True)
