"""Regression heads mapping light curves / spectra → physical parameters.

Capabilities mirrored from reference ``regression.py``:
  * ``VAERegressionHead``            (regression.py:9-26: frozen VAE backbone,
                                      MLP over the flattened posterior mean)
  * ``ContraPhotoRegressionHead``    (regression.py:28-45)
  * ``ContraSpecRegressionHead``     (regression.py:48-65)
  * ``PhotoEnd2EndRegression``       (regression.py:69-104: encoder trained
                                      from scratch with the head)
  * ``SpecEnd2EndRegression``        (regression.py:108-141)

Freezing: the reference flips ``requires_grad=False`` on backbone parameters.
Here ``freeze_backbone=True`` applies ``jax.lax.stop_gradient`` to the
backbone embedding, which has the same effect (zero backbone gradients) while
keeping one parameter pytree; combine with ``optax.masked`` if you also want
to drop the backbone from optimizer state.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from ..nn.layers import MLP
from ..nn.photometric_layers import PhotometricTransformerEncoder
from ..nn.spectra_layers import SpectraTransformerEncoder
from .base_vae import BaseVAE
from .contrastive import ContraPhotSpec

Array = jax.Array


class VAERegressionHead(nn.Module):
    """MLP over a (frozen) VAE's flattened posterior mean."""

    vae: BaseVAE
    outdim: int
    freeze_backbone: bool = True
    mlp_hidden: tuple = (64, 64)

    def setup(self):
        self.outfc = MLP(self.outdim, self.mlp_hidden)

    def __call__(self, x, deterministic: bool = True) -> Array:
        del deterministic  # backbone embedding is always deterministic
        h = self.vae.encode(x, mean=True)  # [B, L, D]
        if self.freeze_backbone:
            h = jax.lax.stop_gradient(h)
        return self.outfc(h.reshape(h.shape[0], -1))


class ContraPhotoRegressionHead(nn.Module):
    """MLP over the (frozen) contrastive photometric tower embedding."""

    contrastnet: ContraPhotSpec
    outdim: int
    freeze_backbone: bool = True
    mlp_hidden: tuple = (64, 64)

    def setup(self):
        self.outfc = MLP(self.outdim, self.mlp_hidden)

    def __call__(self, x, deterministic: bool = True) -> Array:
        del deterministic
        h = self.contrastnet.photo_enc(x)
        if self.freeze_backbone:
            h = jax.lax.stop_gradient(h)
        return self.outfc(h.reshape(h.shape[0], -1))


class ContraSpecRegressionHead(nn.Module):
    """MLP over the (frozen) contrastive spectra tower embedding."""

    contrastnet: ContraPhotSpec
    outdim: int
    freeze_backbone: bool = True
    mlp_hidden: tuple = (64, 64)

    def setup(self):
        self.outfc = MLP(self.outdim, self.mlp_hidden)

    def __call__(self, x, deterministic: bool = True) -> Array:
        del deterministic
        h = self.contrastnet.spectra_enc(x)
        if self.freeze_backbone:
            h = jax.lax.stop_gradient(h)
        return self.outfc(h.reshape(h.shape[0], -1))


class PhotoEnd2EndRegression(nn.Module):
    """Photometric encoder + MLP head trained end-to-end from scratch."""

    outdim: int
    num_bands: int = 6
    latent_len: int = 4
    latent_dim: int = 4
    model_dim: int = 32
    num_heads: int = 4
    ff_dim: int = 32
    num_layers: int = 4
    dropout: float = 0.1
    selfattn: bool = False
    mlp_hidden: tuple = (64, 64)

    def setup(self):
        self.enc = PhotometricTransformerEncoder(
            num_bands=self.num_bands,
            bottleneck_length=self.latent_len,
            bottleneck_dim=self.latent_dim,
            model_dim=self.model_dim,
            num_heads=self.num_heads,
            ff_dim=self.ff_dim,
            num_layers=self.num_layers,
            dropout=self.dropout,
            selfattn=self.selfattn,
        )
        self.outfc = MLP(self.outdim, self.mlp_hidden)

    def __call__(self, x, deterministic: bool = True) -> Array:
        flux, time, band, mask = x
        h = self.enc(flux, time, band, mask, deterministic=deterministic)
        return self.outfc(h.reshape(h.shape[0], -1))


class SpecEnd2EndRegression(nn.Module):
    """Spectra encoder + MLP head trained end-to-end from scratch."""

    outdim: int
    latent_len: int = 4
    latent_dim: int = 4
    model_dim: int = 32
    num_heads: int = 4
    num_layers: int = 4
    ff_dim: int = 32
    dropout: float = 0.1
    selfattn: bool = False
    mlp_hidden: tuple = (64, 64)

    def setup(self):
        self.enc = SpectraTransformerEncoder(
            bottleneck_length=self.latent_len,
            bottleneck_dim=self.latent_dim,
            model_dim=self.model_dim,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            ff_dim=self.ff_dim,
            dropout=self.dropout,
            selfattn=self.selfattn,
        )
        self.outfc = MLP(self.outdim, self.mlp_hidden)

    def __call__(self, x, deterministic: bool = True) -> Array:
        flux, wavelength, phase, mask = x
        # deliberate swap — see models/spectra.py:_enc_params (parity with the
        # reference's positional flux/wavelength transposition)
        h = self.enc(wavelength, flux, phase, mask, deterministic=deterministic)
        return self.outfc(h.reshape(h.shape[0], -1))
