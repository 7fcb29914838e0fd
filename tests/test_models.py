"""Model-level tests: shapes, API contracts, cross-modal matrix conventions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaesne_tpu.distributions import Laplace
from vaesne_tpu.models import (
    BrightPhotometricVAE,
    BrightSpectraVAE,
    ContraPhotSpec,
    HostImgVAE,
    PhotoEnd2EndRegression,
    PhotoSpecMMVAE,
    PhotometricVAE,
    SpecEnd2EndRegression,
    SpectraVAE,
    VAERegressionHead,
)

SMALL = dict(latent_len=4, latent_dim=4, model_dim=16, num_heads=2, ff_dim=16,
             num_layers=2)


def _init(model, key, x, K=1):
    return model.init({"params": key, "sample": key}, x, K)


def test_photometric_vae_forward(key, photometry_batch):
    m = PhotometricVAE(num_bands=6, **SMALL)
    v = _init(m, key, photometry_batch, K=3)
    qz_x, px_z, zs = m.apply(v, photometry_batch, 3, rngs={"sample": key})
    B, L = photometry_batch[0].shape
    assert qz_x.loc.shape == (B, 4, 4)
    assert bool(jnp.all(qz_x.scale > 0))  # softplus positivity
    assert zs.shape == (3, B, 4, 4)
    assert px_z.loc.shape == (3, B, L)


def test_photometric_masked_likelihood_scale(key, photometry_batch):
    m = PhotometricVAE(num_bands=6, **SMALL)
    v = _init(m, key, photometry_batch)
    _, px_z, _ = m.apply(v, photometry_batch, 1, rngs={"sample": key})
    mask = np.asarray(photometry_batch[3])
    scale = np.asarray(px_z.scale[0])
    np.testing.assert_allclose(scale[~mask], 1.0)
    np.testing.assert_allclose(scale[mask], 1.0 + 1e8)


def test_spectra_vae_forward(key, spectra_batch):
    m = SpectraVAE(**SMALL)
    v = _init(m, key, spectra_batch, K=2)
    qz_x, px_z, zs = m.apply(v, spectra_batch, 2, rngs={"sample": key})
    B, N = spectra_batch[0].shape
    assert qz_x.loc.shape == (B, 4, 4)
    assert px_z.loc.shape == (2, B, N)
    mask = np.asarray(spectra_batch[3])
    np.testing.assert_allclose(np.asarray(px_z.scale[0])[mask], 1.0 + 1e10)


def test_bright_variants_recenter_mean(key, photometry_batch, spectra_batch):
    for cls, batch in ((BrightPhotometricVAE, photometry_batch),
                       (BrightSpectraVAE, spectra_batch)):
        m = cls(**SMALL) if cls is BrightSpectraVAE else cls(num_bands=6, **SMALL)
        v = _init(m, key, batch)
        _, px_z, _ = m.apply(v, batch, 1, rngs={"sample": key})
        assert bool(jnp.all(jnp.isfinite(px_z.loc)))


def test_bright_requires_multiple_tokens(key, photometry_batch):
    m = BrightPhotometricVAE(num_bands=6, latent_len=1, latent_dim=4,
                             model_dim=16, num_heads=2, ff_dim=16, num_layers=1)
    with pytest.raises(ValueError):
        _init(m, key, photometry_batch)


def test_encode_decode_roundtrip_api(key, photometry_batch):
    m = PhotometricVAE(num_bands=6, **SMALL)
    v = _init(m, key, photometry_batch)
    mean = m.apply(v, photometry_batch, method="encode")
    assert mean.shape == (photometry_batch[0].shape[0], 4, 4)
    qz = m.apply(v, photometry_batch, False, method="encode")
    assert isinstance(qz, Laplace)
    zs = qz.sample(key, (5,))
    px = m.apply(v, zs, photometry_batch, method="decode")
    assert px.loc.shape == (5,) + photometry_batch[0].shape


@pytest.mark.slow
def test_reconstruct_and_generate(key, spectra_batch):
    m = SpectraVAE(**SMALL)
    v = _init(m, key, spectra_batch)
    rec = m.apply(v, spectra_batch, 7, method="reconstruct", rngs={"sample": key})
    assert rec.shape == (7,) + spectra_batch[0].shape
    gen = m.apply(v, 5, spectra_batch, method="generate", rngs={"sample": key})
    assert gen.shape == (5,) + spectra_batch[0].shape


@pytest.mark.slow
def test_image_vae_pixel_and_hybrid(key):
    img = jnp.ones((2, 3, 16, 16))
    x = (img, jnp.zeros((2, 0)))
    for hybrid in (False, True):
        m = HostImgVAE(img_size=16, patch_size=4, in_channels=3, hybrid=hybrid,
                       **SMALL)
        v = _init(m, key, x, K=2)
        qz_x, px_z, zs = m.apply(v, x, 2, rngs={"sample": key})
        assert px_z.loc.shape == (2, 2, 3, 16, 16)  # [K, B, C, H, W]
        assert qz_x.loc.shape == (2, 4, 4)


def test_image_vae_focal_loc(key):
    img = jnp.ones((2, 3, 16, 16))
    x = (img, jnp.zeros((2, 2)))
    m = HostImgVAE(img_size=16, patch_size=4, in_channels=3, focal_loc=True,
                   **SMALL)
    v = _init(m, key, x)
    qz_x, px_z, _ = m.apply(v, x, 1, rngs={"sample": key})
    assert px_z.loc.shape == (1, 2, 3, 16, 16)


def test_image_vae_malformed_event_loc_raises(key):
    """A non-empty event_loc that is not [B, 2] under focal_loc=True must
    raise, not silently disable conditioning (VERDICT r4 #7)."""
    img = jnp.ones((2, 3, 16, 16))
    m = HostImgVAE(img_size=16, patch_size=4, in_channels=3, focal_loc=True,
                   **SMALL)
    v = _init(m, key, (img, jnp.zeros((2, 2))))
    with pytest.raises(ValueError, match="event_loc"):
        m.apply(v, (img, jnp.zeros((2, 3))), 1, rngs={"sample": key})
    # the empty placeholder (data_util.py:44) still means "no conditioning"
    qz_x, px_z, _ = m.apply(v, (img, jnp.zeros((2, 0))), 1,
                            rngs={"sample": key})
    assert px_z.loc.shape == (1, 2, 3, 16, 16)


def test_mmvae_cross_modal_matrix(key, multimodal_batch):
    """[e][d] convention: row = expert (source), column = decoder (target).
    Reference: try_photospectra_model.py:78."""
    photo = PhotometricVAE(num_bands=6, **SMALL)
    spec = SpectraVAE(**SMALL)
    mm = PhotoSpecMMVAE(vaes=[photo, spec], beta=1.0)
    v = mm.init({"params": key, "sample": key}, multimodal_batch, 2)
    qz_xs, px_zs, zss = mm.apply(mm_vars := v, multimodal_batch, 2,
                                 rngs={"sample": key})
    B = multimodal_batch[0][0].shape[0]
    Lp = multimodal_batch[0][0].shape[1]
    Ns = multimodal_batch[1][0].shape[1]
    assert px_zs[0][0].loc.shape == (2, B, Lp)  # LC→LC
    assert px_zs[0][1].loc.shape == (2, B, Ns)  # LC→spec
    assert px_zs[1][0].loc.shape == (2, B, Lp)  # spec→LC
    assert px_zs[1][1].loc.shape == (2, B, Ns)  # spec→spec
    recons = mm.apply(mm_vars, multimodal_batch, 2, method="reconstruct",
                      rngs={"sample": key})
    assert recons[0][1].shape == (2, B, Ns)


def test_mmvae_llik_scaling_balance():
    photo = PhotometricVAE(num_bands=6, **SMALL)
    spec = SpectraVAE(**SMALL)
    mm = PhotoSpecMMVAE(vaes=[photo, spec], beta=0.5)
    # modality 0 gets length_ratio/beta, modality 1 gets 1/beta (mmVAE.py:82-84)
    np.testing.assert_allclose(mm.llik_scalings[0], (982 / 60) / 0.5)
    np.testing.assert_allclose(mm.llik_scalings[1], 1 / 0.5)


@pytest.mark.slow
def test_mmvae_generate_and_crossmodgen(key, multimodal_batch):
    photo = PhotometricVAE(num_bands=6, **SMALL)
    spec = SpectraVAE(**SMALL)
    mm = PhotoSpecMMVAE(vaes=[photo, spec])
    v = mm.init({"params": key, "sample": key}, multimodal_batch, 1)
    gens = mm.apply(v, 3, multimodal_batch, method="generate", rngs={"sample": key})
    B = multimodal_batch[0][0].shape[0]
    assert gens[0].shape == (3, B, multimodal_batch[0][0].shape[1])
    assert gens[1].shape == (3, B, multimodal_batch[1][0].shape[1])
    cross = mm.apply(v, multimodal_batch[0], multimodal_batch[1], (0, 1), 4,
                     method="crossmodgen", rngs={"sample": key})
    assert cross.shape == (4, B, multimodal_batch[1][0].shape[1])


def test_contrastive_towers(key, multimodal_batch):
    m = ContraPhotSpec(latent_len=4, latent_dim=4, proj_dim=8, num_bands=6,
                       photo_model_dim=16, photo_ff_dim=16, photo_num_layers=2,
                       spec_model_dim=16, spec_ff_dim=16, spec_num_layers=2)
    v = m.init(key, multimodal_batch)
    z1, z2 = m.apply(v, multimodal_batch)
    B = multimodal_batch[0][0].shape[0]
    assert z1.shape == (B, 8) and z2.shape == (B, 8)
    e1 = m.apply(v, multimodal_batch[0], method="photo_enc")
    e2 = m.apply(v, multimodal_batch[1], method="spectra_enc")
    assert e1.shape == (B, 4, 4) and e2.shape == (B, 4, 4)


def test_regression_heads(key, photometry_batch, spectra_batch):
    vae = PhotometricVAE(num_bands=6, **SMALL)
    head = VAERegressionHead(vae=vae, outdim=4)
    v = head.init(key, photometry_batch)
    out = head.apply(v, photometry_batch)
    assert out.shape == (photometry_batch[0].shape[0], 4)

    e2e_p = PhotoEnd2EndRegression(outdim=4, num_bands=6, model_dim=16,
                                   ff_dim=16, num_layers=2, num_heads=2)
    v = e2e_p.init(key, photometry_batch)
    assert e2e_p.apply(v, photometry_batch).shape == (4, 4)

    e2e_s = SpecEnd2EndRegression(outdim=4, model_dim=16, ff_dim=16,
                                  num_layers=2, num_heads=2)
    v = e2e_s.init(key, spectra_batch)
    assert e2e_s.apply(v, spectra_batch).shape == (4, 4)


def test_frozen_head_blocks_backbone_gradients(key, photometry_batch):
    vae = PhotometricVAE(num_bands=6, **SMALL)
    head = VAERegressionHead(vae=vae, outdim=2, freeze_backbone=True)
    v = head.init(key, photometry_batch)

    def loss(params):
        out = head.apply({"params": params}, photometry_batch)
        return jnp.sum(out**2)

    g = jax.grad(loss)(v["params"])
    vae_grads = jax.tree_util.tree_leaves(g["vae"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in vae_grads)
    head_grads = jax.tree_util.tree_leaves(g["outfc"])
    assert any(float(jnp.abs(x).max()) > 0.0 for x in head_grads)
