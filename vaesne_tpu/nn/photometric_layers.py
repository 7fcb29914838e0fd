"""Perceiver-style transformer encoder/decoder for light curves.

Capabilities mirrored from reference ``PhotometricLayers.py``:
  * ``PhotometricTransformerEncoder``  (PhotometricLayers.py:72-143)
  * ``PhotometricTransformerDecoder``  (PhotometricLayers.py:10-69)

A light curve is an irregularly sampled sequence padded to a fixed length
(60 for Goldstein/LSST): per-point ``(flux, time, band, mask)`` where band is
an integer class and ``mask`` is True at padded/unobserved points. Fixed
shapes + boolean masks are exactly what XLA wants — no ragged tensors.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    compute_dtype,
    MLP,
    SingleLayerMLP,
    SinusoidalEmbedding,
    SinusoidalMLPEmbedding,
    TransformerStack,
)

Array = jax.Array


class PhotometricTransformerEncoder(nn.Module):
    """Cross-attention pooling of a masked light curve into bottleneck tokens.

    Learned bottleneck tokens attend to per-point embeddings
    fluxfc(flux) ⊕ time-sinusoid ⊕ band-embedding (fused by concat+MLP when
    ``concat`` else summed), with the key-padding mask on the context only —
    the latent tokens themselves are never masked
    (reference PhotometricLayers.py:127-142).
    Returns [B, bottleneck_length, bottleneck_dim].
    """

    num_bands: int
    bottleneck_length: int
    bottleneck_dim: int
    model_dim: int = 32
    num_heads: int = 4
    ff_dim: int = 32
    num_layers: int = 4
    dropout: float = 0.1
    selfattn: bool = False
    concat: bool = True

    @nn.compact
    def __call__(
        self,
        flux: Array,  # [B, L]
        time: Array,  # [B, L]
        band: Array,  # [B, L] int
        mask: Optional[Array] = None,  # [B, L] bool, True == missing
        deterministic: bool = True,
    ) -> Array:
        band_embd = nn.Embed(self.num_bands, self.model_dim, dtype=compute_dtype(), name="bandembd")(band)
        flux_embd = nn.Dense(self.model_dim, dtype=compute_dtype(), name="fluxfc")(flux[..., None])
        if self.concat:
            time_embd = SinusoidalMLPEmbedding(self.model_dim, name="time_embd")(time)
            tokens = MLP(self.model_dim, (self.model_dim,), name="LCfc")(
                jnp.concatenate([flux_embd, time_embd, band_embd], axis=-1)
            )
        else:
            time_embd = SinusoidalEmbedding(self.model_dim, name="time_embd")(time)
            tokens = flux_embd + time_embd + band_embd

        init = self.param(
            "initbottleneck",
            nn.initializers.normal(stddev=1.0),
            (self.bottleneck_length, self.model_dim),
        )
        x = jnp.broadcast_to(init[None], (flux.shape[0],) + init.shape)
        h = TransformerStack(
            self.model_dim,
            self.num_heads,
            self.ff_dim,
            self.num_layers,
            self.dropout,
            self.selfattn,
            name="blocks",
        )(x, context=tokens, mask=None, context_mask=mask, deterministic=deterministic)
        return SingleLayerMLP(self.bottleneck_dim, name="bottleneckfc")(x + h)


class PhotometricTransformerDecoder(nn.Module):
    """Decode latent tokens into flux on a query grid of (time, band).

    Query tokens = time-sinusoid + band-embedding; they cross-attend to the
    projected latent context. NOTE the reference applies the observation mask
    as the *query self-attention* key-padding mask (PhotometricLayers.py:67),
    so unobserved query positions are hidden from each other but still
    decoded; ``donotmask`` disables that. Output [B, L].
    """

    bottleneck_dim: int
    num_bands: int
    model_dim: int = 32
    num_heads: int = 4
    ff_dim: int = 32
    num_layers: int = 4
    dropout: float = 0.1
    donotmask: bool = False
    selfattn: bool = False

    @nn.compact
    def __call__(
        self,
        time: Array,  # [B, L]
        band: Array,  # [B, L] int
        bottleneck: Array,  # [B, Lz, Dz]
        mask: Optional[Array] = None,  # [B, L] bool
        deterministic: bool = True,
    ) -> Array:
        if self.donotmask:
            mask = None
        time_embd = SinusoidalMLPEmbedding(self.model_dim, name="sinusoidal_time_embd")(time)
        band_embd = nn.Embed(self.num_bands, self.model_dim, dtype=compute_dtype(), name="bandembd")(band)
        x = time_embd + band_embd
        context = MLP(self.model_dim, (self.model_dim,), name="contextfc")(bottleneck)
        h = TransformerStack(
            self.model_dim,
            self.num_heads,
            self.ff_dim,
            self.num_layers,
            self.dropout,
            self.selfattn,
            name="blocks",
        )(x, context=context, mask=mask, context_mask=None, deterministic=deterministic)
        x = x + h
        return SingleLayerMLP(1, name="get_photo")(x)[..., 0]
