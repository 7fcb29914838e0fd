"""Light-curve (photometry) modality VAEs.

Capabilities mirrored from reference ``PhotometricVAE.py``:
  * ``PhotometricVAE``        (PhotometricVAE.py:97-222)
  * ``BrightPhotometricVAE``  (PhotometricVAE.py:226-355; brightness read from
                               latent token 0 and used to recenter decoder loc)

Data contract per batch (PhotometricVAE.py:158): a tuple
``(flux [B,L] f32, time [B,L] f32, band [B,L] int, mask [B,L] bool)`` with
True == missing. Masked points enter the likelihood with scale
``1 + 1e8·mask`` (PhotometricVAE.py:91-94) — a huge-variance soft mask whose
log-prob contribution is a near-constant offset, preserved exactly for
loss-surface parity.
"""

from __future__ import annotations

from typing import Tuple, Type

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..distributions import Laplace
from ..nn.photometric_layers import (
    PhotometricTransformerDecoder,
    PhotometricTransformerEncoder,
)
from .base_vae import BaseVAE, tile_leading

Array = jax.Array

MASK_VARIANCE = 1e8  # reference PhotometricVAE.py:93


class PhotometricVAE(BaseVAE):
    """Transformer VAE over masked, irregularly sampled light curves."""

    num_bands: int = 6
    latent_len: int = 8
    latent_dim: int = 4
    model_dim: int = 64
    num_heads: int = 4
    ff_dim: int = 64
    num_layers: int = 4
    dropout: float = 0.1
    selfattn: bool = False
    concat: bool = True
    beta: float = 1.0
    llik_scaling: float = 1.0  # multiplied on top of 1/beta (MMVAE balance)
    scale_eps: float = 1e-6
    prior: Type = Laplace
    likelihood: Type = Laplace
    posterior: Type = Laplace

    modality_name = "light_curve"  # reference PhotometricVAE.py:151

    @property
    def total_llik_scaling(self) -> float:
        """1/beta (reference PhotometricVAE.py:150) × any modality balance
        factor installed by the MMVAE (mmVAE.py:82-84)."""
        return self.llik_scaling / self.beta

    def setup(self):
        # encoder emits 2·latent_len bottleneck tokens; first half = mu,
        # second half = softplus-var (PhotometricVAE.py:53-54)
        self.enc = PhotometricTransformerEncoder(
            num_bands=self.num_bands,
            bottleneck_length=2 * self.latent_len,
            bottleneck_dim=self.latent_dim,
            model_dim=self.model_dim,
            num_heads=self.num_heads,
            ff_dim=self.ff_dim,
            num_layers=self.num_layers,
            dropout=self.dropout,
            selfattn=self.selfattn,
            concat=self.concat,
        )
        self.dec = PhotometricTransformerDecoder(
            bottleneck_dim=self.latent_dim,
            num_bands=self.num_bands,
            model_dim=self.model_dim,
            num_heads=self.num_heads,
            ff_dim=self.ff_dim,
            num_layers=self.num_layers,
            dropout=self.dropout,
        )

    def _enc_params(self, x, deterministic: bool) -> Tuple[Array, Array]:
        flux, time, band, mask = x
        bottleneck = self.enc(flux, time, band, mask, deterministic=deterministic)
        mu = bottleneck[:, : self.latent_len, :]
        # scale_eps floors the posterior scale: softplus underflows to 0 as
        # the model grows confident, and 1/scale in the (mixture-)posterior
        # log-probs then overflows - the NaN the reference guards with a
        # breakpoint() (PhotometricVAE.py:160-161). 1e-6 is far below any
        # trained scale, so the loss surface is unchanged in practice.
        scale = jax.nn.softplus(bottleneck[:, self.latent_len :, :]) + self.scale_eps
        return mu, scale

    def _dec_dist(self, z_flat, x, K: int, deterministic: bool):
        _, time, band, mask = x
        time_t, band_t, mask_t = (tile_leading(a, K) for a in (time, band, mask))
        loc = self.dec(time_t, band_t, z_flat, mask_t, deterministic=deterministic)
        return self._masked_likelihood(loc, mask_t, MASK_VARIANCE)


class BrightPhotometricVAE(PhotometricVAE):
    """PhotometricVAE whose decoded mean is recentered to a brightness value
    predicted from latent token 0 (reference PhotometricVAE.py:318-332):

      loc ← loc + brightnessfc(z[:, 0, :]) − mean_grid(loc)
    """

    def setup(self):
        if self.latent_len <= 1:
            raise ValueError("first latent token is reserved for overall brightness")
        super().setup()
        from ..nn.layers import MLP

        self.brightnessfc = MLP(1, (self.model_dim,))

    def _dec_dist(self, z_flat, x, K: int, deterministic: bool):
        _, time, band, mask = x
        time_t, band_t, mask_t = (tile_leading(a, K) for a in (time, band, mask))
        brightness = self.brightnessfc(z_flat[:, 0, :])  # [K*B, 1]
        loc = self.dec(time_t, band_t, z_flat, mask_t, deterministic=deterministic)
        loc = loc + brightness - loc.mean(axis=-1, keepdims=True)
        return self._masked_likelihood(loc, mask_t, MASK_VARIANCE)
