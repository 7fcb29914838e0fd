"""Data pipeline tests: npz contract, mask conventions, augmentation."""

import jax
import jax.numpy as jnp
import numpy as np

from vaesne_tpu.data import (
    augment_multimodal,
    augment_photometry,
    augment_spectra,
    make_goldstein_like,
    make_images,
    make_ztf_like,
    multimodal_tuple,
    photometry_tuple,
    random_affine,
    repeat_dataset,
    spectra_tuple,
    train_test_split,
)


def test_goldstein_contract_keys():
    d = make_goldstein_like(n=20, spectrum_bins=50, photometry_length=12)
    for k in ("training_idx", "testing_idx", "flux", "wavelength", "mask",
              "phase", "photoflux", "phototime", "photomask",
              "photowavelength", "identity", "flux_mean", "flux_std",
              "phototime_mean", "phototime_std"):
        assert k in d, k
    assert d["flux"].shape == (20, 50)
    assert d["photoflux"].shape == (20, 12)
    assert d["mask"].max() <= 1 and d["mask"].min() >= 0  # stored 1 = observed
    assert set(np.unique(d["photowavelength"])) <= set(range(6))


def test_ztf_contract():
    d = make_ztf_like(n=10, spectrum_bins=30, photometry_length=8)
    assert set(np.unique(d["photowavelength"])) <= {0, 1}
    for k in ("spectime_mean", "combined_std", "combined_time_mean"):
        assert k in d


def test_tuple_builders_mask_inversion():
    d = make_goldstein_like(n=16, spectrum_bins=40, photometry_length=10)
    spec = spectra_tuple(d)
    photo = photometry_tuple(d)
    # stored 1 = observed → tuple mask True = missing (test_photospectra.py:36)
    np.testing.assert_array_equal(np.asarray(spec[3]), d["mask"] == 0)
    np.testing.assert_array_equal(np.asarray(photo[3]), d["photomask"] == 0)
    assert photo[2].dtype == jnp.int32
    mm = multimodal_tuple(d, idx=np.arange(4))
    assert mm[0][0].shape[0] == 4 and mm[1][0].shape[0] == 4


def test_npz_file_round_trip(tmp_path):
    """Write the synthetic dict to a REAL .npz and reload through load_npz:
    the tuples built from disk must be bit-identical to the in-memory path.
    Closes the one untested seam between the synthetic generators and the
    real-data loader (the reference reads the same layout at
    test_photospectra.py:22-60)."""
    from vaesne_tpu.data import goldstein_labels, load_npz

    d = make_goldstein_like(n=12, spectrum_bins=40, photometry_length=10)
    path = tmp_path / "goldstein.npz"
    np.savez(path, **d)
    loaded = load_npz(str(path))

    assert set(loaded) == set(d)
    for pair in zip(multimodal_tuple(d), multimodal_tuple(loaded)):
        for a, b in zip(*pair):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tr_a, te_a = train_test_split(d)
    tr_b, te_b = train_test_split(loaded)
    np.testing.assert_array_equal(tr_a, tr_b)
    np.testing.assert_array_equal(te_a, te_b)
    # identity filenames survive the save as str arrays → same parsed labels
    np.testing.assert_array_equal(goldstein_labels(d), goldstein_labels(loaded))

    z = make_ztf_like(n=6, spectrum_bins=20, photometry_length=8)
    zpath = tmp_path / "ztf.npz"
    np.savez(zpath, **z)
    zloaded = load_npz(str(zpath))
    for pair in zip(multimodal_tuple(z), multimodal_tuple(zloaded)):
        for a, b in zip(*pair):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in ("spectime_mean", "combined_std", "combined_time_mean"):
        np.testing.assert_array_equal(z[k], zloaded[k])


def test_train_test_split():
    d = make_goldstein_like(n=20, spectrum_bins=30, photometry_length=8)
    tr, te = train_test_split(d)
    assert len(tr) + len(te) == 20
    assert len(np.intersect1d(tr, te)) == 0


def test_augment_spectra_statistics(key):
    d = make_goldstein_like(n=64, spectrum_bins=64, photometry_length=16)
    spec = spectra_tuple(d)
    out = augment_spectra(key, spec)
    noise = np.asarray(out[0] - spec[0])
    assert 0.01 < noise.std() < 0.03  # σ = 0.02
    # masking only ever adds missing points
    assert bool(jnp.all(jnp.logical_or(~spec[3], out[3])))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(spec[1]))


def test_augment_photometry_global_time_shift(key):
    d = make_goldstein_like(n=32, spectrum_bins=32, photometry_length=16)
    photo = photometry_tuple(d)
    out = augment_photometry(key, photo)
    shift = np.asarray(out[1] - photo[1])
    # shift is constant within each curve (test_photospectra.py:76)
    np.testing.assert_allclose(
        shift, np.broadcast_to(shift[:, :1], shift.shape), atol=1e-6)
    assert shift.std() > 0


def test_augment_multimodal_jits(key):
    d = make_goldstein_like(n=16, spectrum_bins=32, photometry_length=8)
    mm = multimodal_tuple(d)
    out = jax.jit(augment_multimodal)(key, mm)
    assert out[0][0].shape == mm[0][0].shape
    assert out[1][0].shape == mm[1][0].shape


def test_random_affine_statistics(key):
    """Reference parity: RandomAffine(degrees=15, translate=(.05,.05),
    scale=(.75,1.25)) (data_util.py:60). Augmented batch differs per image,
    stays in range/shape, and the identity transform is exact."""
    imgs = make_images(n=8, img_size=20)
    out = jax.jit(random_affine)(key, imgs)
    assert out.shape == imgs.shape
    # every image actually transformed (rotation/scale/translate all drawn
    # from continuous ranges — exact identity has measure zero)
    per_img = np.asarray(jnp.abs(out - imgs).max(axis=(1, 2, 3)))
    assert (per_img > 1e-3).all()
    # fill=-1 keeps the normalized [-1, 1] range
    assert float(out.min()) >= -1.0 - 1e-5
    assert float(out.max()) <= float(imgs.max()) + 1e-5
    # degenerate parameter ranges reduce to the identity resample
    ident = random_affine(key, imgs, degrees=0.0, translate=0.0,
                          scale=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(ident), np.asarray(imgs), atol=1e-5)


def test_random_affine_translations_are_whole_pixels(key):
    """torchvision RandomAffine.get_params rounds translations to whole
    pixels (tx = int(round(uniform(-max_dx, max_dx)))); with rotation and
    scale pinned to identity, every output must therefore be an EXACT
    integer pixel shift of the input — no sub-pixel bilinear blur."""
    imgs = make_images(n=8, img_size=11)
    out = np.asarray(random_affine(key, imgs, degrees=0.0, translate=0.2,
                                   scale=(1.0, 1.0)))
    ref = np.asarray(imgs)
    max_px = int(round(0.2 * 11))
    for i in range(imgs.shape[0]):
        match = False
        for dx in range(-max_px, max_px + 1):
            for dy in range(-max_px, max_px + 1):
                shifted = np.full_like(ref[i], -1.0)
                src = ref[i][
                    :,
                    max(0, -dy): ref.shape[2] - max(0, dy),
                    max(0, -dx): ref.shape[3] - max(0, dx),
                ]
                shifted[
                    :,
                    max(0, dy): ref.shape[2] - max(0, -dy),
                    max(0, dx): ref.shape[3] - max(0, -dx),
                ] = src
                if np.allclose(out[i], shifted, atol=1e-5):
                    match = True
                    break
            if match:
                break
        assert match, f"image {i} is not an integer pixel shift"


def test_random_affine_is_linear_in_pixels(key):
    """The warp is a fixed gather + constant fill for a given key, so it must
    be affine in pixel values: warp((a+b)/2) == (warp(a)+warp(b))/2. Catches
    any nonlinearity bug in the bilinear resample."""
    imgs = make_images(n=2, img_size=12)
    a, b = imgs[:1], imgs[1:]
    mixed = random_affine(key, (a + b) / 2, degrees=10.0)
    ya = random_affine(key, a, degrees=10.0)
    yb = random_affine(key, b, degrees=10.0)
    np.testing.assert_allclose(
        np.asarray(mixed), np.asarray((ya + yb) / 2), atol=1e-5)


def test_affine_warp_exact_translation():
    """Pure integer translation is an exact pixel shift with fill at the
    vacated border — pins the warp's translation convention (t is applied in
    OUTPUT pixels: out(p) = in(p - t), torchvision's convention)."""
    from vaesne_tpu.data import affine_warp

    imgs = make_images(n=2, img_size=9)
    z = jnp.zeros((2,))
    out = np.asarray(affine_warp(imgs, theta=z, scale=jnp.ones((2,)),
                                 tx=jnp.full((2,), 2.0),
                                 ty=jnp.full((2,), 1.0), fill=-1.0))
    expect = np.full_like(np.asarray(imgs), -1.0)
    expect[:, :, 1:, 2:] = np.asarray(imgs)[:, :, :-1, :-2]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_affine_warp_exact_rot90():
    """θ=90° on an odd-sized square maps the integer grid onto itself, so
    bilinear sampling is exact: out[r, c] = in[N−1−c, r] = rot90(in, k=−1).
    Pins the rotation direction/center conventions."""
    from vaesne_tpu.data import affine_warp

    imgs = make_images(n=2, img_size=7)
    z = jnp.zeros((2,))
    out = np.asarray(affine_warp(imgs, theta=jnp.full((2,), np.pi / 2),
                                 scale=jnp.ones((2,)), tx=z, ty=z))
    np.testing.assert_allclose(
        out, np.rot90(np.asarray(imgs), k=-1, axes=(-2, -1)), atol=1e-5)


def test_affine_warp_scale_center_invariant():
    """Scaling about the center leaves the exact center pixel of an
    odd-sized image unchanged (zoom-in s=2 keeps everything in-bounds)."""
    from vaesne_tpu.data import affine_warp

    imgs = make_images(n=2, img_size=9)
    z = jnp.zeros((2,))
    out = np.asarray(affine_warp(imgs, theta=z, scale=jnp.full((2,), 2.0),
                                 tx=z, ty=z))
    np.testing.assert_allclose(out[:, :, 4, 4], np.asarray(imgs)[:, :, 4, 4],
                               atol=1e-5)


def test_affine_warp_golden_vs_torch_grid_sample():
    """Golden parity with the reference's augmentation backend: torchvision's
    RandomAffine (data_util.py:60) lowers to an inverse affine matrix
    (torchvision _get_inverse_affine_matrix, center=(0,0), shear=0) sampled
    by ``F.grid_sample(mode="bilinear", padding_mode="zeros",
    align_corners=False)``. Reconstruct that exact pipeline in torch (the
    image has no torchvision, so the two-step lowering is inlined here) and
    pin ``affine_warp`` against it on a non-square batch with simultaneous
    rotation + scale + translation — interpolation weights, rotation
    direction, center and fill blending all must agree."""
    import math

    import torch
    import torch.nn.functional as F

    from vaesne_tpu.data import affine_warp

    def torch_affine(img_t, angle_deg, tx, ty, scale):
        rot = math.radians(angle_deg)
        m = [math.cos(rot) / scale, math.sin(rot) / scale, 0.0,
             -math.sin(rot) / scale, math.cos(rot) / scale, 0.0]
        m[2] += m[0] * (-tx) + m[1] * (-ty)
        m[5] += m[3] * (-tx) + m[4] * (-ty)
        n = img_t.shape[0]
        h, w = img_t.shape[-2:]
        theta = torch.tensor(m, dtype=torch.float32).reshape(1, 2, 3)
        base = torch.empty(1, h, w, 3)
        base[..., 0] = torch.linspace(-w * 0.5 + 0.5, w * 0.5 - 0.5, w)
        base[..., 1].copy_(torch.linspace(-h * 0.5 + 0.5,
                                          h * 0.5 - 0.5, h)[:, None])
        base[..., 2] = 1.0
        rescaled = theta.transpose(1, 2) / torch.tensor([0.5 * w, 0.5 * h])
        grid = (base.reshape(1, h * w, 3).expand(n, h * w, 3)
                .bmm(rescaled.expand(n, 3, 2)).reshape(n, h, w, 2))
        return F.grid_sample(img_t, grid, mode="bilinear",
                             padding_mode="zeros", align_corners=False)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 3, 17, 23)).astype(np.float32)
    angle, tx, ty, scale = 12.5, 2.0, -1.5, 1.1
    golden = torch_affine(torch.from_numpy(img), angle, tx, ty, scale).numpy()
    ours = np.asarray(affine_warp(
        jnp.asarray(img),
        theta=jnp.full((2,), np.deg2rad(angle), jnp.float32),
        scale=jnp.full((2,), scale, jnp.float32),
        tx=jnp.full((2,), tx, jnp.float32),
        ty=jnp.full((2,), ty, jnp.float32), fill=0.0))
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_repeat_dataset():
    d = make_goldstein_like(n=8, spectrum_bins=16, photometry_length=4)
    spec = spectra_tuple(d)
    rep = repeat_dataset(spec, 3)
    assert rep[0].shape[0] == 24


def test_make_images_range():
    imgs = make_images(n=4, img_size=16)
    assert imgs.shape == (4, 3, 16, 16)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0
