"""Mixture-of-experts multimodal VAE (MoE-MMVAE, Shi et al. 2019).

Capabilities mirrored from reference ``mmVAE.py``:
  * ``MMVAE``          (mmVAE.py:17-67, generic over a list of VAEs)
  * ``PhotoSpecMMVAE`` (mmVAE.py:71-132: frozen Laplace prior over
    [latent_len, latent_dim], β scaling via ``llik_scaling = 1/β`` and the
    modality-balance factor ``length_ratio`` (default 982/60) multiplied onto
    modality 0 — mmVAE.py:78-84)

"MoE" here means a mixture-of-experts *posterior* (one expert per modality);
it is NOT sparse expert routing, so no expert parallelism is involved.

``__call__`` fills the M×M cross-modal likelihood matrix: diagonal =
self-reconstruction, off-diagonal ``px_zs[e][d]`` = modality d decoded from
modality e's latents (mmVAE.py:91-106). The matrix is a static nested list of
distribution pytrees, so the whole M² decode fans out inside one jitted graph.

``reconstruct`` indexing convention (documented at try_photospectra_model.py:78):
``[0][0]`` LC→LC, ``[1][0]`` spec→LC, ``[0][1]`` LC→spec, ``[1][1]`` spec→spec.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Type

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..distributions import Distribution, Laplace
from .base_vae import BaseVAE

Array = jax.Array

GOLDSTEIN_LENGTH_RATIO = 982.0 / 60.0  # reference mmVAE.py:72


class MMVAE(nn.Module):
    """Generic MoE-MMVAE over any list of modality VAEs.

    Unlike the reference's generic class (whose off-diagonal decode at
    mmVAE.py:47 ignores conditioning and is unused by any script), the
    off-diagonal here uses ``decode(zs, x[d])`` so every modality decoder
    receives its observation grids — the behavior the exercised subclass
    ``photospecMMVAE`` implements (mmVAE.py:101-104).
    """

    vaes: Sequence[BaseVAE]
    prior: Type = Laplace

    modality_name = "multimodal"

    @property
    def llik_scalings(self) -> Tuple[float, ...]:
        return tuple(v.total_llik_scaling for v in self.vaes)

    def pz(self) -> Distribution:
        shape = (self.vaes[0].latent_len, self.vaes[0].latent_dim)
        return self.prior(jnp.zeros(shape), jnp.ones(shape))

    def __call__(self, x, K: int = 1, deterministic: bool = True):
        """Encode every modality, then fill the M×M likelihood matrix with
        ONE decoder pass per modality: the M experts' latents are stacked on
        the K axis ([M·K, B, L, D]) so each decoder runs once at M× batch
        instead of M times (mmVAE.py:95-104 runs M² separate decoder calls) —
        fewer, larger matmuls for the MXU, identical math."""
        qz_xs, zss = [], []
        for m, vae in enumerate(self.vaes):
            qz_x = vae.encode(x[m], mean=False)
            qz_xs.append(qz_x)
            zss.append(qz_x.sample(self.make_rng("sample"), (K,)))
        M = len(self.vaes)
        z_all = jnp.concatenate(zss, axis=0)  # [M*K, B, L, D]
        px_zs = [[None] * M for _ in range(M)]
        for d, vae in enumerate(self.vaes):
            px_all = vae.decode(z_all, x[d], deterministic=deterministic)
            # slice the stacked distribution back into per-expert pytrees
            # (works for any likelihood: Laplace's (loc, scale) children or
            # MaskedGridLaplace's (loc, mask) + static big)
            for e in range(M):
                px_zs[e][d] = jax.tree_util.tree_map(
                    lambda a, e=e: jax.lax.slice_in_dim(
                        a, e * K, (e + 1) * K, axis=0),
                    px_all,
                )
        return qz_xs, px_zs, zss

    def generate(self, N: int, x):
        """Prior-conditioned generations, one [N, B, ...] array per modality
        (reference mmVAE.py:108-118)."""
        B = jax.tree_util.tree_leaves(x[0])[0].shape[0]
        latents = self.pz().sample(self.make_rng("sample"), (N, B))
        return [vae.decode(latents, x[d], deterministic=True).mean
                for d, vae in enumerate(self.vaes)]

    def reconstruct(self, x, K: int = 1, predictive: bool = False):
        """M×M matrix of posterior reconstructions (mmVAE.py:120-126).

        ``predictive=True`` samples each cell from its observed-point
        likelihood instead of taking the decoder mean — the calibrated-band
        variant of the reference's latent-only spread (PARITY.md "CI
        coverage" prescribes exactly this)."""
        _, px_zs, _ = self(x, K=K, deterministic=True)
        if predictive:
            return [[px_z.observed.sample(self.make_rng("sample"))
                     for px_z in row] for row in px_zs]
        return [[px_z.mean for px_z in row] for row in px_zs]

    def crossmodgen(self, x_in, x_out, direction=(0, 1), K: int = 1,
                    predictive: bool = False):
        """Cross-modal generation: encode modality direction[0] from ``x_in``,
        decode modality direction[1] onto ``x_out``'s grids.

        Implements the intent of mmVAE.py:128-132 (the reference body
        references an undefined name ``LC`` — mmVAE.py:131 — and cannot run).

        ``predictive=False`` (reference semantics) returns the K decoder
        MEANS — their spread is latent-only uncertainty, which is NOT a
        calibrated predictive band (the likelihood scale never enters; see
        PARITY.md "CI coverage"). ``predictive=True`` instead samples each
        draw from the decoder likelihood restricted to observed points
        (``px_z.observed`` — Laplace(loc, 1) for the grid modalities), so
        quantiles over K are quantiles of the model's actual predictive
        distribution p(x_d | x_e) = ∫ p(x_d|z) q(z|x_e) dz."""
        e, d = direction
        qz_x = self.vaes[e].encode(x_in, mean=False)
        zs = qz_x.sample(self.make_rng("sample"), (K,))
        px_z = self.vaes[d].decode(zs, x_out, deterministic=True)
        if predictive:
            return px_z.observed.sample(self.make_rng("sample"))
        return px_z.mean


class PhotoSpecMMVAE(MMVAE):
    """Photometry + spectra MoE-MMVAE with β and modality-balance scaling.

    ``vaes = [photometric_vae, spectra_vae]``. Mirrors mmVAE.py:71-84: both
    sub-VAEs get ``llik_scaling = 1/β`` and modality 0 (photometry) is
    additionally multiplied by ``length_ratio`` so a 60-point light curve is
    not drowned out by a 982-bin spectrum.
    """

    beta: float = 1.0
    length_ratio: float = GOLDSTEIN_LENGTH_RATIO

    def __post_init__(self):
        # Install scaling onto the sub-VAEs before flax freezes the tree, the
        # functional analog of the reference's in-place mutation mmVAE.py:82-84.
        self.vaes = tuple(
            vae.clone(
                beta=self.beta,
                llik_scaling=self.length_ratio if i == 0 else 1.0,
            )
            for i, vae in enumerate(self.vaes)
        )
        super().__post_init__()

    modality_name = "photospectra"  # reference mmVAE.py:76
