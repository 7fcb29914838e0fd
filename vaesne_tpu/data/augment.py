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


AFFINE_DEGREES = 15.0       # data_util.py:60
AFFINE_TRANSLATE = 0.05     # data_util.py:60
AFFINE_SCALE = (0.75, 1.25)  # data_util.py:60


def affine_warp(images: Array, theta: Array, scale: Array, tx: Array,
                ty: Array, fill: float = -1.0) -> Array:
    """Deterministic batched inverse-affine bilinear warp for NCHW batches:
    rotation ``theta`` (radians) and ``scale`` about the image center, then
    translation ``(tx, ty)`` in pixels — all per-image ``[B]`` arrays.

    Shape-static fixed-grid resample: each output pixel inverse-maps through
    the affine and gathers with ``jax.scipy.ndimage.map_coordinates``
    (order=1, constant ``fill`` out of bounds) — one vmapped gather per
    batch, no data-dependent shapes, jit/TPU friendly. Exposed separately
    from ``random_affine`` so exact-geometry tests (pure translation vs roll,
    90° rotation vs rot90) can drive it with fixed parameters."""
    from jax.scipy.ndimage import map_coordinates

    _, _, h, w = images.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    def warp_one(img, th, sc, dx, dy):
        # inverse map: out pixel ← center + R(−θ)/s · (out − center − t)
        c, sn = jnp.cos(th), jnp.sin(th)
        xo, yo = xx - cx - dx, yy - cy - dy
        xi = cx + (c * xo + sn * yo) / sc
        yi = cy + (-sn * xo + c * yo) / sc
        coords = jnp.stack([yi, xi])  # [2, H, W]
        return jax.vmap(
            lambda ch: map_coordinates(ch, coords, order=1, mode="constant",
                                       cval=fill)
        )(img)

    return jax.vmap(warp_one)(images, theta, scale, tx, ty)


def random_affine(
    key: Array,
    images: Array,
    degrees: float = AFFINE_DEGREES,
    translate: float = AFFINE_TRANSLATE,
    scale: Tuple[float, float] = AFFINE_SCALE,
    fill: float = -1.0,
) -> Array:
    """Per-image random rotation + translation + scale for NCHW batches —
    the on-device equivalent of the reference's ``RandomAffine(degrees=15,
    translate=(0.05, 0.05), scale=(0.75, 1.25))`` (data_util.py:60); the
    warp itself is ``affine_warp``.

    ``fill`` handles out-of-bounds samples. The reference applies the affine
    BEFORE ``Normalize(0.5, 0.5)`` with black (0) fill, which lands at −1.0
    in the normalized [−1, 1] space these on-device batches live in — hence
    the default."""
    b, _, h, w = images.shape
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jnp.deg2rad(
        jax.random.uniform(k1, (b,), minval=-degrees, maxval=degrees))
    s = jax.random.uniform(k2, (b,), minval=scale[0], maxval=scale[1])
    t = jax.random.uniform(k3, (b, 2), minval=-translate, maxval=translate)
    # torchvision rounds translations to WHOLE pixels
    # (RandomAffine.get_params: tx = int(round(uniform(-max_dx, max_dx))));
    # match that marginal distribution, not a continuous sub-pixel shift
    tx = jnp.round(t[:, 0] * w)
    ty = jnp.round(t[:, 1] * h)
    return affine_warp(images, theta, s, tx, ty, fill)


def augment_images(key: Array, images: Array) -> Array:
    """Random horizontal/vertical flips + random affine for NCHW batches —
    the on-device analog of the reference's torchvision pipeline
    (data_util.py:56-62: RandomHorizontalFlip, RandomVerticalFlip,
    RandomAffine(degrees=15, translate=(0.05,0.05), scale=(0.75,1.25)))."""
    k1, k2, k3 = jax.random.split(key, 3)
    b = images.shape[0]
    do_h = jax.random.bernoulli(k1, 0.5, (b,))
    do_v = jax.random.bernoulli(k2, 0.5, (b,))
    flipped_h = jnp.where(do_h[:, None, None, None], images[..., ::-1], images)
    flipped = jnp.where(do_v[:, None, None, None], flipped_h[..., ::-1, :], flipped_h)
    return random_affine(k3, flipped)
