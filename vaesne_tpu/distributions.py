"""Pure-functional distributions for TPU-native VAEs.

The PyTorch reference passes ``torch.distributions`` *classes* around as model
configuration (reference: package/VAESNe/base_vae.py:9-13) and relies on
``rsample`` / ``log_prob`` / closed-form-or-MC KL (util_layers.py:313-336).
Here distributions are immutable pytree dataclasses with explicit PRNG-key
threading, so they trace cleanly under jit/vmap/pjit and can cross a
``shard_map`` boundary like any other array pytree.

Defaults everywhere are Laplace (reference uses Laplace for prior,
likelihood, and posterior, e.g. PhotometricVAE.py:110-112).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array
Shape = Tuple[int, ...]


def _as_shape(sample_shape: Union[int, Sequence[int]]) -> Shape:
    if isinstance(sample_shape, int):
        return (sample_shape,)
    return tuple(sample_shape)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Laplace:
    """Laplace(loc, scale) with elementwise (diagonal) parameters.

    Mirrors the semantics the reference gets from ``torch.distributions.
    Laplace``: ``log_prob`` is elementwise, ``rsample`` uses the inverse-CDF
    reparameterization, and ``mean`` is ``loc``.
    """

    loc: Array
    scale: Array

    # -- pytree plumbing -------------------------------------------------
    def tree_flatten(self):
        return (self.loc, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- distribution API ------------------------------------------------
    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    @property
    def mean(self) -> Array:
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self) -> Array:
        return jnp.broadcast_to(2.0 * self.scale**2, self.batch_shape)

    def log_prob(self, x: Array) -> Array:
        return -jnp.abs(x - self.loc) / self.scale - jnp.log(2.0 * self.scale)

    def sample(self, key: Array, sample_shape: Union[int, Sequence[int]] = ()) -> Array:
        """Reparameterized sample (the analog of torch ``rsample``).

        z = loc - scale * sign(u) * log1p(-|u|),  u ~ U(eps-1, 1).

        The open lower bound MUST use ``finfo.eps`` (torch's choice): with
        ``finfo.tiny`` the bound ``tiny - 1`` rounds to exactly -1.0 in
        float32, u == -1 becomes reachable, and log1p(-1) = -inf — one such
        draw (~1 in 2^24) poisons the whole training state with NaNs
        (observed deterministically at epoch 91 of the flagship config).
        """
        shape = _as_shape(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc)
        eps = jnp.finfo(dtype).eps
        u = jax.random.uniform(key, shape, dtype=dtype,
                               minval=eps - 1.0, maxval=1.0)
        return self.loc - self.scale * jnp.sign(u) * jnp.log1p(-jnp.abs(u))

    # torch-API aliases so ported user code reads the same
    rsample = sample

    @property
    def observed(self) -> "Laplace":
        """The decoder likelihood at the OBSERVED-point scale: Laplace(loc,
        1). Decoder scales in this framework are always ``1 + big·mask``
        (materialized by ``BaseVAE._masked_likelihood`` for non-default
        likelihood classes) or exactly 1 (images) — the inflation encodes
        masking, not a predictive model, so predictive draws strip it.
        Meant for ``px_z`` (decoder) distributions; a posterior's learned
        scale has no observed-point reading."""
        return Laplace(self.loc, jnp.ones_like(self.loc))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Normal:
    """Diagonal Normal(loc, scale)."""

    loc: Array
    scale: Array

    def tree_flatten(self):
        return (self.loc, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def batch_shape(self) -> Shape:
        return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

    @property
    def mean(self) -> Array:
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self) -> Array:
        return jnp.broadcast_to(self.scale**2, self.batch_shape)

    def log_prob(self, x: Array) -> Array:
        z = (x - self.loc) / self.scale
        return -0.5 * z**2 - jnp.log(self.scale) - 0.5 * math.log(2.0 * math.pi)

    def sample(self, key: Array, sample_shape: Union[int, Sequence[int]] = ()) -> Array:
        shape = _as_shape(sample_shape) + self.batch_shape
        return self.loc + self.scale * jax.random.normal(key, shape)

    rsample = sample

    @property
    def observed(self) -> "Normal":
        """Normal(loc, 1) — the observed-point decoder scale with the
        ``1 + big·mask`` inflation stripped (see :class:`Laplace.observed`;
        non-default likelihood classes get the materialized inflated scale
        from ``BaseVAE._masked_likelihood``)."""
        return Normal(self.loc, jnp.ones_like(self.loc))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MaskedGridLaplace:
    """Laplace likelihood over a masked observation grid:
    ``scale = 1 + big·mask`` (the decoder mask-variance trick, reference
    PhotometricVAE.py:91-94 / SpectraVAE.py:84-86) stored as ``(loc, mask,
    big)`` instead of a materialized scale tensor.

    API-compatible with :class:`Laplace` (``log_prob``/``mean``/``sample``
    compute the scale lazily — XLA fuses it into consumers), plus
    ``grid_loglik(x)``: the Σ_grid log-pdf every objective needs, fused so
    the [K·B, N] scale and per-point log-prob tensors never exist in HBM —
    on TPU via the Pallas kernel ``ops.laplace.masked_laplace_loglik``,
    elsewhere as one fused XLA reduction.
    """

    loc: Array
    mask: Array  # bool, True == missing
    big: float   # static (pytree aux data)

    def tree_flatten(self):
        return (self.loc, self.mask), self.big

    @classmethod
    def tree_unflatten(cls, big, children):
        return cls(children[0], children[1], big)

    @property
    def scale(self) -> Array:
        m = jnp.broadcast_to(self.mask, jnp.shape(self.loc))
        return 1.0 + self.big * m.astype(jnp.result_type(self.loc, jnp.float32))

    @property
    def batch_shape(self) -> Shape:
        return jnp.shape(self.loc)

    @property
    def mean(self) -> Array:
        return self.loc

    @property
    def variance(self) -> Array:
        return 2.0 * self.scale**2

    def log_prob(self, x: Array) -> Array:
        return Laplace(self.loc, self.scale).log_prob(x)

    def sample(self, key: Array, sample_shape: Union[int, Sequence[int]] = ()) -> Array:
        return Laplace(self.loc, self.scale).sample(key, sample_shape)

    rsample = sample

    @property
    def observed(self) -> "Laplace":
        """The likelihood restricted to OBSERVED grid points: Laplace(loc, 1),
        i.e. the scale without the ``1 + big·mask`` inflation. The inflation
        exists to null masked points' training gradient (SpectraVAE.py:84-86),
        not as a predictive model — sampling WITH it would draw ±``big``-sized
        values on missing bins. Predictive bands (``crossmodgen
        predictive=True``) sample from this distribution."""
        return Laplace(self.loc, jnp.ones_like(self.loc))

    def grid_loglik(self, x: Array) -> Array:
        """Σ over all grid axes of ``log_prob(x)``, keeping the two leading
        (K, B) batch axes. ``x`` broadcasts against ``loc`` (objectives pass
        the unexpanded [B, grid] data)."""
        from .ops import pallas_interpret, use_pallas
        from .ops.laplace import (
            masked_laplace_loglik,
            masked_laplace_loglik_reference,
        )

        lead = self.loc.shape[:2]
        # flatten BATCH-major ([K, B, N] → [B*K, N]): decode produced these
        # arrays batch-major and transposed to [K, B] at its exit, so the
        # swapaxes here cancels that transpose under XLA — and a dp-sharded
        # batch axis propagates through the merge (a K-major flatten would
        # all-gather the batch; see base_vae.tile_leading)
        def flat(a):
            return jnp.swapaxes(a, 0, 1).reshape(lead[1] * lead[0], -1)

        loc = flat(self.loc)
        x2 = flat(jnp.broadcast_to(x, self.loc.shape))
        mask2 = flat(jnp.broadcast_to(self.mask, self.loc.shape))
        n = loc.shape[-1]
        # Pallas pays off when the grid fills TPU lanes (N >= 128); tiny
        # grids (photometry N=60) pad 2x in VMEM for no win — XLA fuses the
        # small reduction fine (same finding as the attention-kernel routing,
        # BASELINE.md "Measurement honesty")
        if use_pallas() and n >= 128:
            out = masked_laplace_loglik(
                loc.astype(jnp.float32), x2.astype(jnp.float32), mask2,
                float(self.big), pallas_interpret())
        else:
            out = masked_laplace_loglik_reference(
                loc.astype(jnp.float32), x2.astype(jnp.float32), mask2,
                float(self.big))
        return jnp.swapaxes(out.reshape(lead[1], lead[0]), 0, 1)


Distribution = Union[Laplace, Normal, MaskedGridLaplace]


def get_mean(d: Distribution, key: Array | None = None, K: int = 100) -> Array:
    """Mean of a distribution, MC fallback when unavailable.

    Reference: util_layers.py:313-323. All distributions here have closed-form
    means, so the MC path exists only for API completeness.
    """
    mean = getattr(d, "mean", None)
    if mean is not None:
        return mean
    if key is None:
        raise ValueError("Distribution has no closed-form mean; pass a PRNG key.")
    return d.sample(key, (K,)).mean(0)


def log_mean_exp(value: Array, axis: int = 0, keepdims: bool = False) -> Array:
    """logsumexp(value, axis) - log(n). Reference: util_layers.py:326-327."""
    n = value.shape[axis]
    return jax.scipy.special.logsumexp(value, axis=axis, keepdims=keepdims) - math.log(n)


def kl_divergence(
    d1: Distribution,
    d2: Distribution,
    key: Array | None = None,
    K: int = 100,
) -> Array:
    """Closed-form KL when available, else an MC estimate.

    Reference: util_layers.py:330-336 (registry lookup then MC fallback).
    Closed forms implemented: Laplace‖Laplace, Normal‖Normal.
    """
    if isinstance(d1, Laplace) and isinstance(d2, Laplace):
        # KL(L(m1,b1) || L(m2,b2)) =
        #   log(b2/b1) + |m1-m2|/b2 + (b1/b2) exp(-|m1-m2|/b1) - 1
        delta = jnp.abs(d1.loc - d2.loc)
        b1, b2 = d1.scale, d2.scale
        return jnp.log(b2 / b1) + delta / b2 + (b1 / b2) * jnp.exp(-delta / b1) - 1.0
    if isinstance(d1, Normal) and isinstance(d2, Normal):
        v1, v2 = d1.scale**2, d2.scale**2
        return 0.5 * (v1 / v2 + (d2.loc - d1.loc) ** 2 / v2 - 1.0 + jnp.log(v2 / v1))
    if key is None:
        raise ValueError("No closed-form KL for this pair; pass a PRNG key for MC.")
    samples = d1.sample(key, (K,))
    return (d1.log_prob(samples) - d2.log_prob(samples)).mean(0)
