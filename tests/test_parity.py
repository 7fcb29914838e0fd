"""Golden parity vs the PyTorch reference (SURVEY §4: the reference is the
test oracle).

Builds the reference models with random torch weights, imports those exact
weights through ``vaesne_tpu.utils.torch_port``, and checks encoder outputs,
decoder outputs, likelihoods, KL, and the assembled ELBO agree to float
tolerance on identical inputs (all deterministic: torch .eval() vs
``deterministic=True``; sampling is bypassed by feeding both sides the same
z). Skipped when the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # live-torch golden runs; skip via -m 'not slow'

torch = pytest.importorskip("torch")

# portable: point VAESNE_REFERENCE at a VAESNe-dev checkout's package/ dir
REF = os.environ.get("VAESNE_REFERENCE", "/root/reference/package")
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from VAESNe.PhotometricVAE import PhotometricVAE as TorchPhotometricVAE
    from VAESNe.SpectraVAE import SpectraVAE as TorchSpectraVAE
    from VAESNe.mmVAE import photospecMMVAE as TorchPhotoSpecMMVAE
except Exception:  # pragma: no cover - reference not mounted
    pytest.skip("reference package unavailable", allow_module_level=True)

import jax
import jax.numpy as jnp

from vaesne_tpu.distributions import Laplace, kl_divergence
from vaesne_tpu.models import PhotometricVAE, PhotoSpecMMVAE, SpectraVAE
from vaesne_tpu.utils.torch_port import (
    convert_photometric_vae,
    convert_photospec_mmvae,
    convert_spectra_vae,
)

DIMS = dict(latent_len=3, latent_dim=4, model_dim=16, num_heads=2, ff_dim=16,
            num_layers=2)
B, LP, NS, BANDS = 3, 14, 25, 6


@pytest.fixture(scope="module")
def photo_pair():
    torch.manual_seed(0)
    t_model = TorchPhotometricVAE(num_bands=BANDS, **DIMS)
    t_model.eval()
    j_model = PhotometricVAE(num_bands=BANDS, **DIMS)
    params = convert_photometric_vae(t_model.state_dict())
    return t_model, j_model, {"params": params}


@pytest.fixture(scope="module")
def spec_pair():
    torch.manual_seed(1)
    t_model = TorchSpectraVAE(**DIMS)
    t_model.eval()
    j_model = SpectraVAE(**DIMS)
    params = convert_spectra_vae(t_model.state_dict())
    return t_model, j_model, {"params": params}


def _photo_batch(seed=0):
    rng = np.random.default_rng(seed)
    flux = rng.normal(size=(B, LP)).astype(np.float32)
    time = np.sort(rng.uniform(-1, 1, (B, LP))).astype(np.float32)
    band = rng.integers(0, BANDS, (B, LP))
    mask = rng.uniform(size=(B, LP)) < 0.25
    return flux, time, band, mask


def _spec_batch(seed=1):
    rng = np.random.default_rng(seed)
    flux = rng.normal(size=(B, NS)).astype(np.float32)
    wl = np.tile(np.linspace(-1, 1, NS, dtype=np.float32), (B, 1))
    phase = rng.normal(size=(B,)).astype(np.float32)
    mask = rng.uniform(size=(B, NS)) < 0.25
    return flux, wl, phase, mask


def _t(x):
    if x.dtype == bool:
        return torch.tensor(x)
    if np.issubdtype(x.dtype, np.integer):
        return torch.tensor(x, dtype=torch.int64)
    return torch.tensor(x, dtype=torch.float32)


def _j(x):
    if np.issubdtype(np.asarray(x).dtype, np.integer):
        return jnp.asarray(x, jnp.int32)
    return jnp.asarray(x)


def test_photometric_encoder_parity(photo_pair):
    t_model, j_model, variables = photo_pair
    flux, time, band, mask = _photo_batch()
    with torch.no_grad():
        t_mu, t_var = t_model.enc(_t(flux), _t(time), _t(band), _t(mask))
    qz = j_model.apply(variables, tuple(map(_j, (flux, time, band, mask))),
                       method="encode", mean=False)
    np.testing.assert_allclose(np.asarray(qz.loc), t_mu.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qz.scale), t_var.numpy(), atol=1e-4)


def test_photometric_decoder_parity(photo_pair):
    t_model, j_model, variables = photo_pair
    flux, time, band, mask = _photo_batch()
    rng = np.random.default_rng(7)
    z = rng.normal(size=(2, B, DIMS["latent_len"], DIMS["latent_dim"])).astype(
        np.float32)
    with torch.no_grad():
        zt = _t(z.reshape(2 * B, *z.shape[2:]))
        t_loc, t_scale = t_model.dec(
            _t(time).repeat(2, 1), _t(band).repeat(2, 1), zt,
            _t(mask).repeat(2, 1))
    px = j_model.apply(variables, _j(z),
                       tuple(map(_j, (flux, time, band, mask))), method="decode")
    np.testing.assert_allclose(
        np.asarray(px.mean).reshape(t_loc.shape), t_loc.numpy(), atol=1e-4)


def test_spectra_encoder_parity(spec_pair):
    t_model, j_model, variables = spec_pair
    flux, wl, phase, mask = _spec_batch()
    with torch.no_grad():
        t_mu, t_var = t_model.enc(_t(flux), _t(wl), _t(phase), _t(mask))
    qz = j_model.apply(variables, tuple(map(_j, (flux, wl, phase, mask))),
                       method="encode", mean=False)
    np.testing.assert_allclose(np.asarray(qz.loc), t_mu.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qz.scale), t_var.numpy(), atol=1e-4)


def test_spectra_decoder_parity(spec_pair):
    t_model, j_model, variables = spec_pair
    flux, wl, phase, mask = _spec_batch()
    rng = np.random.default_rng(8)
    z = rng.normal(size=(2, B, DIMS["latent_len"], DIMS["latent_dim"])).astype(
        np.float32)
    with torch.no_grad():
        zt = _t(z.reshape(2 * B, *z.shape[2:]))
        t_loc, t_scale = t_model.dec(
            _t(wl).repeat(2, 1), _t(phase).repeat(2), zt, _t(mask).repeat(2, 1))
    px = j_model.apply(variables, _j(z),
                       tuple(map(_j, (flux, wl, phase, mask))), method="decode")
    np.testing.assert_allclose(
        np.asarray(px.mean).reshape(t_loc.shape), t_loc.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(px.scale).reshape(t_scale.shape), t_scale.numpy(), rtol=1e-6)


def test_elbo_parity_within_one_percent(photo_pair):
    """Assembled deterministic ELBO (fixed z both sides) within 1% — the
    BASELINE.md parity target, without sampling noise."""
    t_model, j_model, variables = photo_pair
    flux, time, band, mask = _photo_batch()
    x_t = (_t(flux), _t(time), _t(band), _t(mask))
    x_j = tuple(map(_j, (flux, time, band, mask)))
    rng = np.random.default_rng(9)
    K = 2
    z = rng.normal(size=(K, B, DIMS["latent_len"], DIMS["latent_dim"])).astype(
        np.float32)

    # torch side: replicate losses.py:16-24 with fixed z
    import torch.distributions as dist

    with torch.no_grad():
        t_mu, t_var = t_model.enc(*x_t)
        qz_x = dist.Laplace(t_mu, t_var)
        loc, scale = t_model.dec(
            _t(time).repeat(K, 1), _t(band).repeat(K, 1),
            _t(z.reshape(K * B, *z.shape[2:])), _t(mask).repeat(K, 1))
        px_z = dist.Laplace(loc.reshape(K, B, -1), scale.reshape(K, B, -1))
        lpx_z = (px_z.log_prob(_t(flux)[None].expand(K, B, LP))
                 * t_model.llik_scaling).sum(-1)
        kld = dist.kl_divergence(qz_x, dist.Laplace(*t_model.pz_params))
        t_elbo = float((lpx_z - kld.sum((-1, -2))[None, :]).mean())

    # jax side: same math through our modules
    qz = j_model.apply(variables, x_j, method="encode", mean=False)
    px = j_model.apply(variables, _j(z), x_j, method="decode")
    lpx = px.log_prob(_j(flux)[None]).reshape(K, B, -1).sum(-1)
    lpx = lpx * j_model.total_llik_scaling
    kld_j = kl_divergence(qz, j_model.pz()).sum((-1, -2))
    j_elbo = float((lpx - kld_j[None, :]).mean())

    assert abs(j_elbo - t_elbo) <= 0.01 * abs(t_elbo), (j_elbo, t_elbo)
    np.testing.assert_allclose(j_elbo, t_elbo, rtol=1e-4)


def test_mmvae_cross_decode_parity():
    torch.manual_seed(3)
    t_photo = TorchPhotometricVAE(num_bands=BANDS, **DIMS)
    t_spec = TorchSpectraVAE(**DIMS)
    t_mm = TorchPhotoSpecMMVAE(vaes=[t_photo, t_spec], beta=1.0)
    t_mm.eval()

    j_mm = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=BANDS, **DIMS), SpectraVAE(**DIMS)],
        beta=1.0,
    )
    variables = {"params": convert_photospec_mmvae(t_mm.state_dict())}

    photo = _photo_batch()
    spec = _spec_batch()
    rng = np.random.default_rng(11)
    z = rng.normal(size=(1, B, DIMS["latent_len"], DIMS["latent_dim"])).astype(
        np.float32)

    with torch.no_grad():
        # LC latents → spectra decoder (the mmVAE.py:101-104 off-diagonal)
        sflux, swl, sphase, smask = map(_t, spec)
        t_loc, _ = t_mm.vaes[1].dec(swl, sphase, _t(z.reshape(B, *z.shape[2:])),
                                    smask)
    j_px = j_mm.vaes[1].apply(
        {"params": variables["params"]["vaes_1"]}, _j(z),
        tuple(map(_j, spec)), method="decode")
    np.testing.assert_allclose(
        np.asarray(j_px.mean).reshape(t_loc.shape), t_loc.numpy(), atol=1e-4)


def test_contrastive_tower_parity():
    torch.manual_seed(5)
    sys.path.insert(0, REF)
    from VAESNe.contrastiveNets import ContraPhotSpec as TorchContra

    from vaesne_tpu.models import ContraPhotSpec
    from vaesne_tpu.utils.torch_port import convert_contrastive

    t_net = TorchContra(latent_len=3, latent_dim=4, proj_dim=8, num_bands=BANDS,
                        photo_model_dim=16, photo_num_heads=2, photo_ff_dim=16,
                        photo_num_layers=2, photo_dropout=0.1,
                        spec_model_dim=16, spec_num_heads=2,
                        spec_num_layers=2, spec_ff_dim=16, spec_dropout=0.1,
                        selfattn=False)
    t_net.eval()
    j_net = ContraPhotSpec(latent_len=3, latent_dim=4, proj_dim=8,
                           num_bands=BANDS, photo_model_dim=16,
                           photo_num_heads=2, photo_ff_dim=16,
                           photo_num_layers=2, spec_model_dim=16,
                           spec_num_heads=2, spec_num_layers=2, spec_ff_dim=16)
    variables = {"params": convert_contrastive(t_net.state_dict())}

    photo = _photo_batch(3)
    spec = _spec_batch(4)
    with torch.no_grad():
        t_z1, t_z2 = t_net((tuple(map(_t, photo)), tuple(map(_t, spec))))
    j_z1, j_z2 = j_net.apply(
        variables, (tuple(map(_j, photo)), tuple(map(_j, spec))), True)
    np.testing.assert_allclose(np.asarray(j_z1), t_z1.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_z2), t_z2.numpy(), atol=1e-4)


@pytest.mark.parametrize("hybrid", [True, False])
def test_hostimg_vae_parity(hybrid):
    torch.manual_seed(6)
    from VAESNe.ImageVAE import HostImgVAE as TorchHostImgVAE

    from vaesne_tpu.models import HostImgVAE
    from vaesne_tpu.utils.torch_port import convert_hostimg_vae

    dims = dict(img_size=16, patch_size=4, in_channels=3, latent_len=3,
                latent_dim=4, model_dim=16, num_heads=2, ff_dim=16,
                num_layers=2, hybrid=hybrid)
    t_model = TorchHostImgVAE(**dims)
    t_model.eval()
    j_model = HostImgVAE(**dims)
    variables = {"params": convert_hostimg_vae(t_model.state_dict())}

    rng = np.random.default_rng(12)
    img = rng.normal(size=(B, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        t_mu, t_var = t_model.enc(_t(img))
    qz = j_model.apply(
        variables, (_j(img), jnp.zeros((B, 0), jnp.float32)),
        method="encode", mean=False)
    np.testing.assert_allclose(np.asarray(qz.loc), t_mu.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(qz.scale), t_var.numpy(), atol=1e-4)

    z = rng.normal(size=(1, B, 3, 4)).astype(np.float32)
    with torch.no_grad():
        t_loc, _ = t_model.dec(_t(z.reshape(B, 3, 4)))
    px = j_model.apply(variables, _j(z),
                       (_j(img), jnp.zeros((B, 0), jnp.float32)),
                       method="decode")
    np.testing.assert_allclose(
        np.asarray(px.mean).reshape(t_loc.shape), t_loc.numpy(), atol=2e-4)


def test_m_iwae_objective_parity():
    """The assembled MoE-IWAE estimator on fixed latents and imported weights
    matches a torch transcription of losses.py:47-62 exactly."""
    torch.manual_seed(7)
    import torch.distributions as tdist

    from vaesne_tpu import objectives
    from vaesne_tpu.distributions import Laplace as JLaplace

    t_photo = TorchPhotometricVAE(num_bands=BANDS, **DIMS)
    t_spec = TorchSpectraVAE(**DIMS)
    t_mm = TorchPhotoSpecMMVAE(vaes=[t_photo, t_spec], beta=1.0)
    t_mm.eval()
    j_mm = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=BANDS, **DIMS), SpectraVAE(**DIMS)],
        beta=1.0,
    )
    variables = {"params": convert_photospec_mmvae(t_mm.state_dict())}

    photo = _photo_batch(21)
    spec = _spec_batch(22)
    x_j = (tuple(map(_j, photo)), tuple(map(_j, spec)))
    x_t = (tuple(map(_t, photo)), tuple(map(_t, spec)))
    K = 2
    rng = np.random.default_rng(23)
    zs_np = [rng.normal(size=(K, B, DIMS["latent_len"], DIMS["latent_dim"])
                        ).astype(np.float32) for _ in range(2)]

    # ---- jax side: terms on fixed z
    qz_xs = [j_mm.vaes[m].apply({"params": variables["params"][f"vaes_{m}"]},
                                x_j[m], method="encode", mean=False)
             for m in range(2)]
    px_zs = [[j_mm.vaes[d].apply({"params": variables["params"][f"vaes_{d}"]},
                                 _j(zs_np[e]), x_j[d], method="decode")
              for d in range(2)] for e in range(2)]
    zss = [_j(z) for z in zs_np]
    pz = JLaplace(jnp.zeros((DIMS["latent_len"], DIMS["latent_dim"])),
                  jnp.ones((DIMS["latent_len"], DIMS["latent_dim"])))
    scalings = j_mm.llik_scalings
    j_val = float(objectives.m_iwae_terms(qz_xs, px_zs, zss, x_j, scalings, pz))

    # ---- torch side: transcription of losses.py:47-62
    with torch.no_grad():
        t_qz = []
        for m, xm in enumerate(x_t):
            mu, var = t_mm.vaes[m].enc(*xm)
            t_qz.append(tdist.Laplace(mu, var))
        t_pz = tdist.Laplace(torch.zeros(DIMS["latent_len"], DIMS["latent_dim"]),
                             torch.ones(DIMS["latent_len"], DIMS["latent_dim"]))
        lws = []
        for r in range(2):
            zr = _t(zs_np[r].reshape(K * B, DIMS["latent_len"], DIMS["latent_dim"]))
            zr_kb = _t(zs_np[r])
            lpz = t_pz.log_prob(zr_kb).sum((-1, -2))
            stacked = torch.stack([qz.log_prob(zr_kb).sum((-1, -2))
                                   for qz in t_qz])
            lqz = torch.logsumexp(stacked, dim=0) - np.log(2.0)
            lpx = 0.0
            for d in range(2):
                grids = x_t[d][1:]
                loc, scale = t_mm.vaes[d].dec(*grids[:-1], zr, grids[-1]) \
                    if False else t_mm.vaes[d].dec(
                        *( [g.repeat(K, *([1] * (g.dim() - 1))) for g in grids[:-1]]
                           + [zr, grids[-1].repeat(K, 1)] ))
                px = tdist.Laplace(loc.reshape(K, B, -1), scale.reshape(K, B, -1))
                lp = px.log_prob(x_t[d][0][None].expand(K, B, -1).reshape(K, B, -1))
                lpx = lpx + lp.sum(-1) * t_mm.vaes[d].llik_scaling
            lws.append(lpz + lpx - lqz)
        t_val = float(torch.logsumexp(torch.cat(lws, 0), dim=0).sub(
            np.log(2.0 * K)).sum())

    assert abs(j_val - t_val) <= 0.01 * abs(t_val), (j_val, t_val)
    np.testing.assert_allclose(j_val, t_val, rtol=2e-4)


@pytest.mark.parametrize("modality", ["photometric", "spectra"])
def test_bright_vae_parity(modality):
    """Bright* variants: decoder-mean recentering to the predicted brightness
    (PhotometricVAE.py:318-332, SpectraVAE.py:308-322)."""
    torch.manual_seed(8)
    from VAESNe.PhotometricVAE import BrightPhotometricVAE as TBrightPhoto
    from VAESNe.SpectraVAE import BrightSpectraVAE as TBrightSpec

    from vaesne_tpu.models import BrightPhotometricVAE, BrightSpectraVAE

    if modality == "photometric":
        t_model = TBrightPhoto(num_bands=BANDS, **DIMS)
        j_model = BrightPhotometricVAE(num_bands=BANDS, **DIMS)
        batch = _photo_batch(31)
        params = convert_photometric_vae(t_model.state_dict())
    else:
        t_model = TBrightSpec(**DIMS)
        j_model = BrightSpectraVAE(**DIMS)
        batch = _spec_batch(32)
        params = convert_spectra_vae(t_model.state_dict())
    t_model.eval()
    variables = {"params": params}

    rng = np.random.default_rng(33)
    K = 2
    z = rng.normal(size=(K, B, DIMS["latent_len"], DIMS["latent_dim"])).astype(
        np.float32)
    with torch.no_grad():
        t_px = t_model.decode(_t(z), tuple(map(_t, batch)))
        t_loc = t_px.loc
    px = j_model.apply(variables, _j(z), tuple(map(_j, batch)),
                       method="decode")
    np.testing.assert_allclose(np.asarray(px.mean), t_loc.numpy(), atol=2e-4)


def test_neg_info_nce_parity():
    """Symmetric InfoNCE on imported contrastive weights matches the
    reference's negInfoNCE (losses.py:98-110)."""
    torch.manual_seed(9)
    import torch.nn.functional as tF

    from VAESNe.contrastiveNets import ContraPhotSpec as TorchContra

    from vaesne_tpu import objectives
    from vaesne_tpu.models import ContraPhotSpec
    from vaesne_tpu.utils.torch_port import convert_contrastive

    kw = dict(latent_len=3, latent_dim=4, proj_dim=8, num_bands=BANDS,
              photo_model_dim=16, photo_num_heads=2, photo_ff_dim=16,
              photo_num_layers=2, spec_model_dim=16, spec_num_heads=2,
              spec_num_layers=2, spec_ff_dim=16)
    t_net = TorchContra(photo_dropout=0.1, spec_dropout=0.1, selfattn=False, **kw)
    t_net.eval()
    j_net = ContraPhotSpec(**kw)
    variables = {"params": convert_contrastive(t_net.state_dict())}

    photo = _photo_batch(41)
    spec = _spec_batch(42)
    x_t = (tuple(map(_t, photo)), tuple(map(_t, spec)))
    x_j = (tuple(map(_j, photo)), tuple(map(_j, spec)))
    tau = 0.1

    # torch transcription of losses.py:98-110
    with torch.no_grad():
        z1, z2 = t_net(x_t)
        z1 = tF.normalize(z1, dim=-1)
        z2 = tF.normalize(z2, dim=-1)
        logits = z1 @ z2.T / tau
        labels = torch.arange(z1.shape[0])
        t_val = -0.5 * (tF.cross_entropy(logits, labels)
                        + tF.cross_entropy(logits.T, labels))
    j_val = objectives.neg_info_nce(j_net, variables, x_j, temperature=tau,
                                    deterministic=True)
    np.testing.assert_allclose(float(j_val), float(t_val), rtol=1e-4, atol=1e-6)


def test_whole_module_pickle_import_roundtrip(tmp_path, photo_pair):
    """VERDICT r3 #5: the reference's ACTUAL checkpoint format is a
    whole-module pickle (``torch.save(model)``, loaded weights_only=False —
    spect_cond_LC.py:75-82). Freshly pickle a reference model, import it
    through utils.torch_port.import_reference_pickle, and check the
    resulting flax params compute the identical encoder forward."""
    from vaesne_tpu.utils.torch_port import (
        import_reference_pickle,
        load_reference_pickle,
    )

    t_model, j_model, variables = photo_pair
    pkl = str(tmp_path / "whole_module.pth")
    torch.save(t_model, pkl)

    sd, cls = load_reference_pickle(pkl, package_path=REF)
    assert cls == "PhotometricVAE"
    params = import_reference_pickle(pkl, package_path=REF)

    flux, time, band, mask = _photo_batch()
    with torch.no_grad():
        t_mu, t_var = t_model.enc(_t(flux), _t(time), _t(band), _t(mask))
    qz = j_model.apply({"params": params},
                       tuple(map(_j, (flux, time, band, mask))),
                       method="encode", mean=False)
    np.testing.assert_allclose(np.asarray(qz.loc), t_mu.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qz.scale), t_var.numpy(), atol=1e-4)


def test_state_dict_pickle_needs_class_name(tmp_path, photo_pair):
    """A bare state_dict pickle imports too, but requires class_name= (the
    module class is not recoverable from tensors alone)."""
    from vaesne_tpu.utils.torch_port import import_reference_pickle

    t_model, j_model, variables = photo_pair
    pkl = str(tmp_path / "state_dict.pth")
    torch.save(t_model.state_dict(), pkl)

    with pytest.raises(ValueError, match="class_name"):
        import_reference_pickle(pkl, package_path=REF)
    params = import_reference_pickle(pkl, package_path=REF,
                                     class_name="PhotometricVAE")
    ref = variables["params"]
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path({"p": params}),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path({"p": ref}),
                   key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(a, b)


def test_mmvae_whole_module_pickle_import(tmp_path):
    """Flagship-format pickle (photospecMMVAE module) → flax MMVAE params."""
    from vaesne_tpu.utils.torch_port import import_reference_pickle

    torch.manual_seed(4)
    t_model = TorchPhotoSpecMMVAE(
        vaes=[TorchPhotometricVAE(num_bands=BANDS, **DIMS),
              TorchSpectraVAE(**DIMS)], beta=1.0)
    t_model.eval()
    pkl = str(tmp_path / "mmvae.pth")
    torch.save(t_model, pkl)
    params = import_reference_pickle(pkl, package_path=REF)

    j_model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=BANDS, **DIMS), SpectraVAE(**DIMS)],
        beta=1.0)
    flux, time, band, mask = _photo_batch()
    with torch.no_grad():
        t_mu, _ = t_model.vaes[0].enc(_t(flux), _t(time), _t(band), _t(mask))
    qz = j_model.apply(
        {"params": params},
        method=lambda m: m.vaes[0].encode(
            tuple(map(_j, (flux, time, band, mask))), False))
    np.testing.assert_allclose(np.asarray(qz.loc), t_mu.numpy(), atol=2e-5)
