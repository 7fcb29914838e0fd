"""Spectrum modality VAEs.

Capabilities mirrored from reference ``SpectraVAE.py``:
  * ``SpectraVAE``        (SpectraVAE.py:90-206)
  * ``BrightSpectraVAE``  (SpectraVAE.py:211-332; brightness token from latent
                           token 0 + phase, decoder mean recentering at
                           SpectraVAE.py:319)

Data contract per batch (SpectraVAE.py:149): a tuple
``(flux [B,N] f32, wavelength [B,N] f32, phase [B] f32, mask [B,N] bool)``
with True == missing; N = 982 for Goldstein. Masked points get likelihood
scale ``1 + 1e10·mask`` (SpectraVAE.py:84-86).
"""

from __future__ import annotations

from typing import Tuple, Type

import jax
import jax.numpy as jnp

from ..distributions import Laplace
from ..nn.layers import MLP
from ..nn.spectra_layers import SpectraTransformerDecoder, SpectraTransformerEncoder
from .base_vae import BaseVAE, tile_leading

Array = jax.Array

MASK_VARIANCE = 1e10  # reference SpectraVAE.py:86


class SpectraVAE(BaseVAE):
    """Transformer VAE over masked spectra on a padded wavelength grid."""

    latent_len: int = 4
    latent_dim: int = 2
    model_dim: int = 32
    num_heads: int = 4
    ff_dim: int = 32
    num_layers: int = 4
    dropout: float = 0.1
    selfattn: bool = False
    concat: bool = True
    beta: float = 1.0
    llik_scaling: float = 1.0
    scale_eps: float = 1e-6
    prior: Type = Laplace
    likelihood: Type = Laplace
    posterior: Type = Laplace

    modality_name = "spectrum"  # reference SpectraVAE.py:143

    @property
    def total_llik_scaling(self) -> float:
        return self.llik_scaling / self.beta

    def setup(self):
        self.enc = SpectraTransformerEncoder(
            bottleneck_length=2 * self.latent_len,
            bottleneck_dim=self.latent_dim,
            model_dim=self.model_dim,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            ff_dim=self.ff_dim,
            dropout=self.dropout,
            selfattn=self.selfattn,
            concat=self.concat,
        )
        self.dec = SpectraTransformerDecoder(
            bottleneck_dim=self.latent_dim,
            model_dim=self.model_dim,
            num_heads=self.num_heads,
            ff_dim=self.ff_dim,
            num_layers=self.num_layers,
            dropout=self.dropout,
        )

    def _enc_params(self, x, deterministic: bool) -> Tuple[Array, Array]:
        flux, wavelength, phase, mask = x
        # NB deliberate swap: the reference's SpectraEnc passes
        # (flux, wavelength, ...) positionally into
        # spectraTransformerEncoder.forward(wavelength, flux, ...)
        # (SpectraVAE.py:41-44 vs SpectraLayers.py:112-122), so its exercised
        # behavior embeds WAVELENGTH through the linear flux path and FLUX
        # through the sinusoidal wavelength path. Reproduced here for golden
        # parity (tests/test_parity.py) — swap back for the 'intended'
        # semantics.
        bottleneck = self.enc(wavelength, flux, phase, mask, deterministic=deterministic)
        mu = bottleneck[:, : self.latent_len, :]
        # scale_eps floors the posterior scale: softplus underflows to 0 as
        # the model grows confident, and 1/scale in the (mixture-)posterior
        # log-probs then overflows - the NaN the reference guards with a
        # breakpoint() (PhotometricVAE.py:160-161). 1e-6 is far below any
        # trained scale, so the loss surface is unchanged in practice.
        scale = jax.nn.softplus(bottleneck[:, self.latent_len :, :]) + self.scale_eps
        return mu, scale

    def _dec_dist(self, z_flat, x, K: int, deterministic: bool):
        _, wavelength, phase, mask = x
        wl_t, phase_t, mask_t = (tile_leading(a, K) for a in (wavelength, phase, mask))
        loc = self.dec(wl_t, phase_t, z_flat, mask_t, deterministic=deterministic)
        return self._masked_likelihood(loc, mask_t, MASK_VARIANCE)


class BrightSpectraVAE(SpectraVAE):
    """SpectraVAE with decoder-mean recentering to a brightness predicted from
    (latent token 0, phase) — reference SpectraVAE.py:308-322:

      loc ← loc + brightnessfc([z₀, phase]) − mean_grid(loc)
    """

    def setup(self):
        if self.latent_len <= 1:
            raise ValueError("need at least one token for overall brightness")
        super().setup()
        self.brightnessfc = MLP(1, (self.model_dim,))

    def _dec_dist(self, z_flat, x, K: int, deterministic: bool):
        _, wavelength, phase, mask = x
        wl_t, phase_t, mask_t = (tile_leading(a, K) for a in (wavelength, phase, mask))
        brightness = self.brightnessfc(
            jnp.concatenate([z_flat[:, 0, :], phase_t[:, None]], axis=-1)
        )  # [K*B, 1]
        loc = self.dec(wl_t, phase_t, z_flat, mask_t, deterministic=deterministic)
        loc = loc + brightness - loc.mean(axis=-1, keepdims=True)
        return self._masked_likelihood(loc, mask_t, MASK_VARIANCE)
