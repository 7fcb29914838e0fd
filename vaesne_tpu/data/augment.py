"""Jit-able, explicitly-keyed data augmentation.

The reference augments once on host at load time with the global torch RNG
(test_photospectra.py:44-47, 74-78; ZTF_spectonly.py:33-41):
  * additive flux noise, σ = 0.02
  * a single per-curve global time shift, σ = 0.1 (photometry only)
  * random extra masking with probability 0.05 (0.05–0.10 for ZTF)

Here the same transforms are pure functions of a PRNG key, applied on-device
per epoch inside jit — fresh augmentation every epoch (strictly stronger than
the reference's one-shot host augmentation) and fully reproducible.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

FLUX_NOISE = 0.02       # test_photospectra.py:45,75
TIME_SHIFT = 0.1        # test_photospectra.py:76
EXTRA_MASK_PROB = 0.05  # test_photospectra.py:47,78


def augment_spectra(
    key: Array,
    batch: Tuple[Array, Array, Array, Array],
    flux_noise: float = FLUX_NOISE,
    extra_mask_prob: float = EXTRA_MASK_PROB,
) -> Tuple[Array, Array, Array, Array]:
    """(flux, wavelength, phase, mask) → noised flux + extra random masking."""
    flux, wavelength, phase, mask = batch
    k1, k2 = jax.random.split(key)
    flux = flux + flux_noise * jax.random.normal(k1, flux.shape)
    mask = jnp.logical_or(mask, jax.random.uniform(k2, flux.shape) < extra_mask_prob)
    return flux, wavelength, phase, mask


def augment_photometry(
    key: Array,
    batch: Tuple[Array, Array, Array, Array],
    flux_noise: float = FLUX_NOISE,
    time_shift: float = TIME_SHIFT,
    extra_mask_prob: float = EXTRA_MASK_PROB,
) -> Tuple[Array, Array, Array, Array]:
    """(flux, time, band, mask) → noised flux, per-curve time shift, masking."""
    flux, time, band, mask = batch
    k1, k2, k3 = jax.random.split(key, 3)
    flux = flux + flux_noise * jax.random.normal(k1, flux.shape)
    time = time + time_shift * jax.random.normal(k2, (time.shape[0],))[:, None]
    mask = jnp.logical_or(mask, jax.random.uniform(k3, flux.shape) < extra_mask_prob)
    return flux, time, band, mask


def augment_multimodal(key: Array, batch, **kwargs):
    """((photo), (spectra)) with independent keys per modality."""
    kp, ks = jax.random.split(key)
    return (augment_photometry(kp, batch[0], **kwargs),
            augment_spectra(ks, batch[1], **kwargs))


def repeat_dataset(batch, factor: int):
    """×factor repetition along the sample axis (the ZTF scripts' repeat
    augmentation, ZTF_spectonly.py:33-41); combine with per-epoch on-device
    augmentation to diversify the copies."""
    return jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a] * factor, axis=0), batch
    )


def augment_images(key: Array, images: Array) -> Array:
    """Random horizontal/vertical flips for NCHW image batches — the on-device
    analog of the reference's torchvision flip transforms
    (data_util.py:56-60). Affine jitter is approximated by flips + small
    translations via roll (cheap, shape-static)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b = images.shape[0]
    do_h = jax.random.bernoulli(k1, 0.5, (b,))
    do_v = jax.random.bernoulli(k2, 0.5, (b,))
    flipped_h = jnp.where(do_h[:, None, None, None], images[..., ::-1], images)
    flipped = jnp.where(do_v[:, None, None, None], flipped_h[..., ::-1, :], flipped_h)
    shifts = jax.random.randint(k3, (b, 2), -3, 4)

    def roll_one(img, sh):
        return jnp.roll(img, (sh[0], sh[1]), axis=(-2, -1))

    return jax.vmap(roll_one)(flipped, shifts)
