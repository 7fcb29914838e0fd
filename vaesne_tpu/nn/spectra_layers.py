"""Perceiver-style transformer encoder/decoder for supernova spectra.

Capabilities mirrored from reference ``SpectraLayers.py``:
  * ``SpectraTransformerEncoder``  (SpectraLayers.py:66-138)
  * ``SpectraTransformerDecoder``  (SpectraLayers.py:11-63)

A spectrum is flux on a (padded, length-982) wavelength grid plus a scalar
phase; the phase is appended to the attention context as one extra token with
its mask entry forced to observed (SpectraLayers.py:128-131).

Reference quirk, documented deliberately: ``SpectraEnc`` calls the encoder as
``(flux, wavelength, ...)`` against a ``(wavelength, flux, ...)`` signature
(SpectraVAE.py:41-44 vs SpectraLayers.py:112), so the reference's linear
"flux" embedding actually consumes wavelength and the sinusoid consumes flux.
Both routes feed one fusion MLP so the model class is equivalent up to input
relabeling; we implement the *named intent* (linear on flux, sinusoid on
wavelength) and keep this note for parity audits.
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


class SpectraTransformerEncoder(nn.Module):
    """Bottleneck tokens cross-attend to [flux⊕λ-embedding tokens + phase token].

    Returns [B, bottleneck_length, bottleneck_dim].
    """

    bottleneck_length: int
    bottleneck_dim: int
    model_dim: int = 32
    num_heads: int = 4
    num_layers: int = 4
    ff_dim: int = 32
    dropout: float = 0.1
    selfattn: bool = False
    concat: bool = True

    @nn.compact
    def __call__(
        self,
        flux: Array,  # [B, N]
        wavelength: Array,  # [B, N]
        phase: Array,  # [B]
        mask: Optional[Array] = None,  # [B, N] bool, True == missing
        deterministic: bool = True,
    ) -> Array:
        flux_lin = nn.Dense(self.model_dim, dtype=compute_dtype(), name="flux_embd")(flux[..., None])
        if self.concat:
            wl_embd = SinusoidalEmbedding(self.model_dim, name="wavelength_embd")(wavelength)
            tokens = MLP(self.model_dim, (self.model_dim,), name="spectrafc")(
                jnp.concatenate([flux_lin, wl_embd], axis=-1)
            )
        else:
            wl_embd = SinusoidalMLPEmbedding(self.model_dim, name="wavelength_embd")(wavelength)
            tokens = flux_lin + wl_embd

        phase_embd = SinusoidalMLPEmbedding(self.model_dim, name="phase_embd")(phase[..., None])
        context = jnp.concatenate([tokens, phase_embd], axis=1)  # [B, N+1, E]
        if mask is not None:
            # phase token is always observed (reference SpectraLayers.py:129-131)
            mask = jnp.concatenate(
                [mask, jnp.zeros((mask.shape[0], 1), dtype=bool)], axis=1
            )

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
        )(x, context=context, mask=None, context_mask=mask, deterministic=deterministic)
        return SingleLayerMLP(self.bottleneck_dim, name="bottleneckfc")(x + h)


class SpectraTransformerDecoder(nn.Module):
    """Decode latent tokens into flux on a wavelength grid, phase-conditioned.

    Query tokens = λ-embedding; context = [projected latent ⊕ phase embedding];
    residual head ``get_flux(x + h)`` (reference SpectraLayers.py:55-63). As in
    the reference, the observation mask is applied to the *query self-attention*
    (SpectraLayers.py:62). Output [B, N].
    """

    bottleneck_dim: int
    model_dim: int = 32
    num_heads: int = 4
    ff_dim: int = 32
    num_layers: int = 4
    dropout: float = 0.1
    selfattn: bool = False

    @nn.compact
    def __call__(
        self,
        wavelength: Array,  # [B, N]
        phase: Array,  # [B]
        bottleneck: Array,  # [B, Lz, Dz]
        mask: Optional[Array] = None,  # [B, N] bool
        deterministic: bool = True,
    ) -> Array:
        wl_embd = SinusoidalMLPEmbedding(self.model_dim, name="wavelength_embd_layer")(wavelength)
        phase_embd = SinusoidalMLPEmbedding(self.model_dim, name="phase_embd_layer")(
            phase[..., None]
        )
        x = wl_embd
        context = MLP(self.model_dim, (self.model_dim,), name="contextfc")(bottleneck)
        context = jnp.concatenate([context, phase_embd], axis=1)
        h = TransformerStack(
            self.model_dim,
            self.num_heads,
            self.ff_dim,
            self.num_layers,
            self.dropout,
            self.selfattn,
            name="blocks",
        )(x, context=context, mask=mask, context_mask=None, deterministic=deterministic)
        return SingleLayerMLP(1, name="get_flux")(x + h)[..., 0]
