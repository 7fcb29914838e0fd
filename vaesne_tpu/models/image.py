"""Host-galaxy image modality VAE (ViT-style).

Capabilities mirrored from reference ``ImageVAE.py``:
  * ``HostImgVAE`` (ImageVAE.py:110-242) with the per-pixel decoder
    (ImageLayers.py:63) and the hybrid patch-token + CNN-refinement decoder
    (ImageLayers.py:116), selected by ``hybrid=``.

Data contract (ImageVAE.py:187-191): ``x = (image [B,C,H,W], event_loc)``
where event_loc is a [B,2] coordinate used only when ``focal_loc`` (otherwise
an empty placeholder — reference data_util.py:44). The external contract stays
NCHW for drop-in parity; internally everything runs NHWC (TPU conv layout).
"""

from __future__ import annotations

from typing import Tuple, Type

import jax
import jax.numpy as jnp

from ..distributions import Laplace
from ..nn.image_layers import (
    HostImgTransformerDecoder,
    HostImgTransformerDecoderHybrid,
    HostImgTransformerEncoder,
)
from .base_vae import BaseVAE

Array = jax.Array


class HostImgVAE(BaseVAE):
    """Transformer VAE over host-galaxy images."""

    img_size: int = 60
    latent_len: int = 4
    latent_dim: int = 4
    patch_size: int = 4
    in_channels: int = 3
    focal_loc: bool = False
    model_dim: int = 32
    num_heads: int = 4
    ff_dim: int = 32
    num_layers: int = 4
    dropout: float = 0.1
    selfattn: bool = False
    hybrid: bool = True
    beta: float = 1.0
    llik_scaling: float = 1.0
    scale_eps: float = 1e-6
    prior: Type = Laplace
    likelihood: Type = Laplace
    posterior: Type = Laplace

    modality_name = "HostImage"  # reference ImageVAE.py:179

    @property
    def total_llik_scaling(self) -> float:
        return self.llik_scaling / self.beta

    def setup(self):
        self.enc = HostImgTransformerEncoder(
            img_size=self.img_size,
            bottleneck_length=2 * self.latent_len,
            bottleneck_dim=self.latent_dim,
            patch_size=self.patch_size,
            in_channels=self.in_channels,
            focal_loc=self.focal_loc,
            model_dim=self.model_dim,
            num_heads=self.num_heads,
            ff_dim=self.ff_dim,
            num_layers=self.num_layers,
            dropout=self.dropout,
            selfattn=self.selfattn,
        )
        if self.hybrid:
            self.dec = HostImgTransformerDecoderHybrid(
                img_size=self.img_size,
                bottleneck_dim=self.latent_dim,
                patch_size=self.patch_size,
                in_channels=self.in_channels,
                model_dim=self.model_dim,
                num_heads=self.num_heads,
                ff_dim=self.ff_dim,
                num_layers=self.num_layers,
                dropout=self.dropout,
                selfattn=self.selfattn,
            )
        else:
            self.dec = HostImgTransformerDecoder(
                img_size=self.img_size,
                bottleneck_dim=self.latent_dim,
                in_channels=self.in_channels,
                model_dim=self.model_dim,
                num_heads=self.num_heads,
                ff_dim=self.ff_dim,
                num_layers=self.num_layers,
                dropout=self.dropout,
                selfattn=self.selfattn,
            )

    def _split_x(self, x):
        """(image, event_loc) with event_loc honored only under focal_loc
        (reference ImageVAE.py:187-191; empty placeholder otherwise).

        An EMPTY second element is the dataset placeholder
        (``ImagePathDataset`` yields ``(image, empty_tensor)``,
        data_util.py:44) and means "no conditioning". A NON-empty
        event_loc that is not ``[B, 2]`` is a caller bug — raising beats
        silently disabling the conditioning the caller asked for."""
        image = x[0]
        event_loc = x[1] if (self.focal_loc and len(x) > 1) else None
        if event_loc is not None and event_loc.size == 0:
            event_loc = None
        if event_loc is not None and (event_loc.ndim != 2 or event_loc.shape[-1] != 2):
            raise ValueError(
                f"focal_loc=True expects event_loc of shape [B, 2] (sky "
                f"coordinates per event), got {event_loc.shape}; pass an "
                "empty array to disable conditioning")
        return image, event_loc

    def _enc_params(self, x, deterministic: bool) -> Tuple[Array, Array]:
        image, event_loc = self._split_x(x)
        image = jnp.transpose(image, (0, 2, 3, 1))  # NCHW → NHWC
        bottleneck = self.enc(image, event_loc, deterministic=deterministic)
        mu = bottleneck[:, : self.latent_len, :]
        # scale_eps floors the posterior scale: softplus underflows to 0 as
        # the model grows confident, and 1/scale in the (mixture-)posterior
        # log-probs then overflows - the NaN the reference guards with a
        # breakpoint() (PhotometricVAE.py:160-161). 1e-6 is far below any
        # trained scale, so the loss surface is unchanged in practice.
        scale = jax.nn.softplus(bottleneck[:, self.latent_len :, :]) + self.scale_eps
        return mu, scale

    def _dec_loc_scale(self, z_flat, x, K: int, deterministic: bool):
        del x, K  # image decoding is unconditional on the input grids
        loc = self.dec(z_flat, deterministic=deterministic)  # [K*B, H, W, C]
        loc = jnp.transpose(loc, (0, 3, 1, 2))  # NHWC → NCHW contract
        scale = jnp.ones_like(loc)  # no mask for images (ImageVAE.py:104-107)
        return loc, scale
