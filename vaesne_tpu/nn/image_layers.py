"""ViT-style transformer encoder/decoders for host-galaxy images.

Capabilities mirrored from reference ``ImageLayers.py``:
  * ``HostImgTransformerEncoder``        (ImageLayers.py:6-60)
  * ``HostImgTransformerDecoder``        (ImageLayers.py:63-110, per-pixel)
  * ``HostImgTransformerDecoderHybrid``  (ImageLayers.py:116-180,
                                          patch tokens + CNN refinement)

Layout: all internals are NHWC (TPU-native for convs); the model layer
(`models/image.py`) converts from the reference's NCHW data contract at the
boundary.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    compute_dtype,
    MLP,
    PatchEmbedding,
    SingleLayerMLP,
    SinusoidalMLPEmbedding,
    TransformerStack,
    sinusoidal_embedding_2d,
)

Array = jax.Array


class HostImgTransformerEncoder(nn.Module):
    """Patch-embed + 2D sin-cos positions (+ optional event-location tokens),
    pooled into bottleneck tokens by cross-attention.

    ``event_loc`` is a [B, 2] coordinate embedded to two extra context tokens
    when ``focal_loc`` (reference ImageLayers.py:42-53). Input [B, H, W, C].
    Returns [B, bottleneck_length, bottleneck_dim].
    """

    img_size: int
    bottleneck_length: int
    bottleneck_dim: int
    patch_size: int = 4
    in_channels: int = 3
    focal_loc: bool = False
    model_dim: int = 32
    num_heads: int = 4
    ff_dim: int = 32
    num_layers: int = 4
    dropout: float = 0.1
    selfattn: bool = False
    sincosin: bool = True

    @nn.compact
    def __call__(
        self,
        image: Array,  # [B, H, W, C]
        event_loc: Optional[Array] = None,  # [B, 2]
        deterministic: bool = True,
    ) -> Array:
        if self.img_size % self.patch_size != 0:
            raise ValueError("image size must be divisible by patch size")
        grid = self.img_size // self.patch_size
        tokens = PatchEmbedding(self.patch_size, self.model_dim, name="patch_embed")(image)
        if self.sincosin:
            pos = sinusoidal_embedding_2d(self.model_dim, grid, grid)
        else:
            pos = self.param(
                "pos_embed", nn.initializers.zeros, (grid * grid, self.model_dim)
            )
        tokens = tokens + pos[None]
        if self.focal_loc:
            if event_loc is None:
                event_loc = jnp.zeros((image.shape[0], 2), dtype=image.dtype)
            loc_tokens = SinusoidalMLPEmbedding(self.model_dim, name="eventloc_embd")(event_loc)
            context = jnp.concatenate([tokens, loc_tokens], axis=1)
        else:
            context = tokens

        init = self.param(
            "initbottleneck",
            nn.initializers.normal(stddev=1.0),
            (self.bottleneck_length, self.model_dim),
        )
        x = jnp.broadcast_to(init[None], (image.shape[0],) + init.shape)
        h = TransformerStack(
            self.model_dim,
            self.num_heads,
            self.ff_dim,
            self.num_layers,
            self.dropout,
            self.selfattn,
            name="blocks",
        )(x, context=context, deterministic=deterministic)
        return SingleLayerMLP(self.bottleneck_dim, name="bottleneckfc")(x + h)


class HostImgTransformerDecoder(nn.Module):
    """Per-pixel decoder: one query token per pixel on a fixed 2D sin-cos grid
    cross-attending to the projected latent (reference ImageLayers.py:96-110).
    Returns [B, H, W, C].
    """

    img_size: int
    bottleneck_dim: int
    in_channels: int = 3
    model_dim: int = 32
    num_heads: int = 4
    ff_dim: int = 32
    num_layers: int = 4
    dropout: float = 0.1
    selfattn: bool = False
    mlpdecoder: bool = True

    @nn.compact
    def __call__(self, bottleneck: Array, deterministic: bool = True) -> Array:
        b = bottleneck.shape[0]
        pos = sinusoidal_embedding_2d(self.model_dim, self.img_size, self.img_size)
        x = jnp.broadcast_to(pos[None], (b,) + pos.shape)
        context = MLP(self.model_dim, (self.model_dim,), name="contextfc")(bottleneck)
        h = TransformerStack(
            self.model_dim,
            self.num_heads,
            self.ff_dim,
            self.num_layers,
            self.dropout,
            self.selfattn,
            name="blocks",
        )(x, context=context, deterministic=deterministic)
        h = h + x
        if self.mlpdecoder:
            h = MLP(self.in_channels, (self.model_dim,), name="decoder")(h)
        else:
            h = nn.Dense(self.in_channels, dtype=compute_dtype(), name="decoder")(h)
        return h.reshape(b, self.img_size, self.img_size, self.in_channels)


class HostImgTransformerDecoderHybrid(nn.Module):
    """Hybrid decoder: patch query tokens → per-patch feature maps → conv
    refinement stack (reference ImageLayers.py:162-180). The token→patch
    unfold is a reshape/transpose (pixel-shuffle), then two 'same' convs
    (model_dim → 4·model_dim → in_channels). Returns [B, H, W, C].
    """

    img_size: int
    bottleneck_dim: int
    patch_size: int = 4
    in_channels: int = 3
    model_dim: int = 64
    num_heads: int = 4
    ff_dim: int = 128
    num_layers: int = 4
    dropout: float = 0.1
    selfattn: bool = False

    @nn.compact
    def __call__(self, bottleneck: Array, deterministic: bool = True) -> Array:
        if self.img_size % self.patch_size != 0:
            raise ValueError("patch_size must divide img_size")
        b = bottleneck.shape[0]
        g, p, d = self.img_size // self.patch_size, self.patch_size, self.model_dim
        pos = sinusoidal_embedding_2d(d, g, g)
        x = jnp.broadcast_to(pos[None], (b,) + pos.shape)
        context = MLP(d, (d,), name="contextfc")(bottleneck)
        h = TransformerStack(
            d,
            self.num_heads,
            self.ff_dim,
            self.num_layers,
            self.dropout,
            self.selfattn,
            name="blocks",
        )(x, context=context, deterministic=deterministic)
        h = h + x
        h = nn.Dense(d * p * p, name="decoder")(h)  # [B, g*g, p*p*d]
        # unfold patches: [B, g, g, p, p, D] → [B, g*p, g*p, D]
        h = h.reshape(b, g, g, p, p, d)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * p, g * p, d)
        mid = d * 4
        h = nn.Conv(mid, (p, p), padding="SAME", name="refine_0")(h)
        h = nn.relu(h)
        h = nn.Conv(self.in_channels, (p, p), padding="SAME", name="refine_1")(h)
        return h
