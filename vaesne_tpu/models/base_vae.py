"""Distribution-parameterized VAE skeleton (reference base_vae.py:8-60).

The torch reference holds distribution *classes* (`pz`, `px_z`, `qz_x`) plus
encoder/decoder modules on an nn.Module and mutates state (`_qz_x_params`,
`self.eval()`) during forward. The TPU-native version is a flax module whose
methods are pure: explicit PRNG keys, explicit `deterministic` flag instead
of train/eval mode flips, distributions returned as array pytrees.

Uniform API across all modality VAEs (matches the reference surface at e.g.
PhotometricVAE.py:157-222):

  __call__(x, K)       -> (qz_x, px_z, zs)      # needs rngs={'sample': key}
  encode(x, mean)      -> posterior mean or distribution
  decode(zs, x)        -> px_z likelihood over the modality grid
  reconstruct(x, K)    -> posterior-mean reconstructions [K, B, ...]
  generate(N, x)       -> prior-sample generations conditioned on x's grids

The importance-sample axis K is handled by flattening K·B into one batch for
the decoder (the reference's expand/reshape idiom at SpectraVAE.py:186-196);
under jit this is a free reshape and keeps all matmuls large for the MXU.
"""

from __future__ import annotations

from typing import Any, Tuple, Type

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..distributions import Distribution, Laplace

Array = jax.Array


def tile_leading(a: Array, K: int) -> Array:
    """[B, ...] → [B*K, ...] by broadcasting a new SECOND axis (free in XLA).

    BATCH-MAJOR row order (row b*K + k carries batch element b, sample k):
    flattening with the batch axis MAJOR is what lets GSPMD/Shardy propagate
    a dim-0 batch sharding straight through the merge — the K-major order
    ([K*B], batch minor) is not representable as a sharding of the merged
    axis, so a dp mesh would all-gather the full batch at every decoder
    K-expansion (observed in round 3's HLO audit). Must stay consistent with
    ``BaseVAE.decode``'s z-flatten and unflatten."""
    return jnp.broadcast_to(
        a[:, None], (a.shape[0], K) + a.shape[1:]
    ).reshape((a.shape[0] * K,) + a.shape[1:])


class BaseVAE(nn.Module):
    """Shared behavior for modality VAEs.

    Subclasses define (as dataclass fields) ``latent_len``, ``latent_dim``,
    ``llik_scaling`` and the distribution classes, and implement:

      _enc_params(x, deterministic) -> (mu, scale)  each [B, L, D]

    plus ONE of:

      _dec_loc_scale(z_flat, x, K, deterministic) -> (loc, scale) flat [K*B, ...]
      _dec_dist(z_flat, x, K, deterministic) -> Distribution with flat [K*B, ...]
        batch (override this to return a fused-likelihood pytree such as
        ``MaskedGridLaplace`` — see ``_masked_likelihood``)
    """

    # -- prior -----------------------------------------------------------
    def pz(self) -> Distribution:
        """Standard prior over [latent_len, latent_dim] tokens.

        The reference stores these as frozen parameters zeros/ones
        (e.g. PhotometricVAE.py:146-149); they never train, so here they are
        constants (scale = 1, despite the reference's 'logvar' comment).
        """
        shape = (self.latent_len, self.latent_dim)
        return self.prior(jnp.zeros(shape), jnp.ones(shape))

    # -- core ------------------------------------------------------------
    def __call__(self, x, K: int = 1, deterministic: bool = True):
        mu, scale = self._enc_params(x, deterministic)
        qz_x = self.posterior(mu, scale)
        zs = qz_x.sample(self.make_rng("sample"), (K,))
        px_z = self.decode(zs, x, deterministic=deterministic)
        return qz_x, px_z, zs

    def encode(self, x, mean: bool = True):
        """Posterior mean (or the full distribution). Always deterministic
        (the reference flips eval mode: PhotometricVAE.py:179-186)."""
        mu, scale = self._enc_params(x, True)
        qz_x = self.posterior(mu, scale)
        return qz_x.mean if mean else qz_x

    def decode(self, zs: Array, x, deterministic: bool = True) -> Distribution:
        """zs: [K, B, latent_len, latent_dim] → likelihood with batch [K, B, ...].

        The decoder runs on a BATCH-MAJOR flat axis (row b*K + k — see
        ``tile_leading``): under a dp mesh the flatten then preserves dim-0
        batch sharding (a K-major flatten forces a full-batch all-gather).
        The exit reshape+transpose restores the [K, B] convention; for the
        fused-likelihood path ``grid_loglik`` flattens batch-major again, so
        XLA cancels the pair and no transpose is materialized on the hot
        training path."""
        K, B = zs.shape[0], zs.shape[1]
        z_flat = jnp.swapaxes(zs, 0, 1).reshape((B * K,) + zs.shape[2:])
        px_flat = self._dec_dist(z_flat, x, K, deterministic)
        # unflatten the leading B·K axis of every array in the distribution
        # pytree (loc/scale, or loc/mask for MaskedGridLaplace) back to the
        # [K, B, ...] convention
        return jax.tree_util.tree_map(
            lambda a: jnp.swapaxes(
                a.reshape((B, K) + a.shape[1:]), 0, 1), px_flat
        )

    def _dec_dist(self, z_flat, x, K: int, deterministic: bool) -> Distribution:
        """Default: wrap the subclass's (loc, scale) into ``likelihood``."""
        loc, scale = self._dec_loc_scale(z_flat, x, K, deterministic)
        return self.likelihood(loc, scale)

    def _masked_likelihood(self, loc: Array, mask: Array, big: float) -> Distribution:
        """The decoder mask-variance trick, fused where possible: for the
        (default) Laplace likelihood return a ``MaskedGridLaplace`` so
        objectives take the fused/Pallas Σ-log-pdf path (``grid_loglik``)
        without ever materializing the [K·B, N] scale tensor; any other
        likelihood class gets the materialized ``1 + big·mask`` scale
        (reference PhotometricVAE.py:91-94 / SpectraVAE.py:84-86)."""
        from ..distributions import MaskedGridLaplace

        if self.likelihood is Laplace:
            return MaskedGridLaplace(loc, mask, big)
        return self.likelihood(loc, jnp.ones_like(loc) + big * mask)

    def reconstruct(self, x, K: int = 1, predictive: bool = False) -> Array:
        """Posterior-sample reconstructions, [K, B, ...].

        ``predictive=False`` (reference base_vae.py:53 semantics): the mean
        of p(x|z_k) per draw — spread over K is latent-only. ``True``:
        sample each draw from the observed-point likelihood
        (``px_z.observed``), giving draws from the model's predictive
        distribution (see PARITY.md "CI coverage")."""
        mu, scale = self._enc_params(x, True)
        qz_x = self.posterior(mu, scale)
        zs = qz_x.sample(self.make_rng("sample"), (K,))
        px_z = self.decode(zs, x, deterministic=True)
        if predictive:
            return px_z.observed.sample(self.make_rng("sample"))
        return px_z.mean

    def generate(self, N: int, x) -> Array:
        """Prior-sample generations conditioned on x's observation grids.

        Samples z ~ p(z) of shape [N, B, L, D] (the corrected generalization
        of SpectraVAE.py:198-206, which hardcodes batch 1; see also
        mmVAE.py:108-118 which does exactly this). Returns [N, B, ...]."""
        B = jax.tree_util.tree_leaves(x)[0].shape[0]
        zs = self.pz().sample(self.make_rng("sample"), (N, B))
        return self.decode(zs, x, deterministic=True).mean
