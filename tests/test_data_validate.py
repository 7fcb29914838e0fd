"""Contract validator: synthetic generators must validate clean; each class
of corruption must be caught with a targeted message."""

import numpy as np
import pytest

from vaesne_tpu.data import make_goldstein_like, make_ztf_like
from vaesne_tpu.data.validate import validate_npz


@pytest.fixture(scope="module")
def gold():
    return make_goldstein_like(n=32, seed=0)


def test_synthetic_goldstein_is_valid(gold):
    assert validate_npz(gold) == []


def test_synthetic_ztf_is_valid():
    assert validate_npz(make_ztf_like(n=16, seed=1), kind="ztf") == []


def test_goldstein_data_fails_ztf_contract(gold):
    problems = validate_npz(gold, kind="ztf")
    assert len(problems) == 1 and "missing keys" in problems[0]
    assert "spectime_mean" in problems[0]


def test_missing_key(gold):
    d = dict(gold)
    del d["photomask"]
    problems = validate_npz(d)
    assert any("missing keys" in p and "photomask" in p for p in problems)


def test_bad_mask_values(gold):
    d = dict(gold)
    d["mask"] = d["mask"].copy()
    d["mask"][0, 0] = 7
    assert any("0/1" in p for p in validate_npz(d))


def test_nan_under_observed_mask(gold):
    d = dict(gold)
    d["flux"] = d["flux"].copy()
    obs = np.argwhere(d["mask"] == 1)[0]
    d["flux"][tuple(obs)] = np.nan
    assert any("non-finite" in p for p in validate_npz(d))


def test_nan_under_missing_mask_is_fine(gold):
    d = dict(gold)
    d["flux"] = d["flux"].copy()
    miss = np.argwhere(d["mask"] == 0)[0]
    d["flux"][tuple(miss)] = np.nan  # padded/missing points may be garbage
    assert validate_npz(d) == []


def test_shape_mismatch(gold):
    d = dict(gold)
    d["wavelength"] = d["wavelength"][:, :-1]
    assert any("wavelength" in p and "shape" in p for p in validate_npz(d))


def test_misaligned_modalities(gold):
    d = dict(gold)
    d["photoflux"] = d["photoflux"][:-1]
    probs = validate_npz(d)
    assert any("index-aligned" in p for p in probs)


def test_index_out_of_range_and_overlap(gold):
    d = dict(gold)
    d["training_idx"] = d["training_idx"].copy()
    d["training_idx"][0] = d["flux"].shape[0] + 5
    assert any("out of range" in p for p in validate_npz(d))
    d2 = dict(gold)
    d2["testing_idx"] = d2["training_idx"][:4]
    assert any("overlap" in p for p in validate_npz(d2))


def test_fractional_band_index(gold):
    d = dict(gold)
    d["photowavelength"] = d["photowavelength"].astype(np.float32) + 0.5
    assert any("integral" in p for p in validate_npz(d))


def test_nonpositive_std(gold):
    d = dict(gold)
    d["flux_std"] = np.float32(0.0)
    assert any("flux_std" in p and "positive" in p for p in validate_npz(d))


def test_cli_roundtrip(tmp_path, gold, capsys):
    from vaesne_tpu.data.validate import main

    path = tmp_path / "gold.npz"
    np.savez(path, **gold)
    assert main([str(path)]) == 0
    assert "OK" in capsys.readouterr().out

    bad = dict(gold)
    del bad["phase_mean"]
    bad_path = tmp_path / "bad.npz"
    np.savez(bad_path, **bad)
    assert main([str(bad_path)]) == 1
    assert "INVALID" in capsys.readouterr().out
