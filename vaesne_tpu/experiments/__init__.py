"""Experiment drivers: the TPU-native equivalents of the reference's
``cannon/`` scripts (SURVEY §2.3).

Train:
  train_photometry      — Goldstein LC VAE          (test_photometry.py)
  train_spectra         — Goldstein spectra VAE     (test_spectra.py)
  train_photospectra    — flagship MoE-MMVAE        (test_photospectra.py)
  train_contrastive     — InfoNCE two-tower         (test_photospectra_contrast.py)
  train_image           — host-image VAE / MNIST    (test_ZTFimage.py, mnist.py)
  train_ztf_spectra     — ZTF spectra VAE           (ZTF_spectonly.py)
  train_ztf_photospect  — ZTF MMVAE                 (ZTF_photospect.py)
  train_regression      — 6 param-regression heads  ({photometry,spec}2goldstein_*.py)

Evaluate:
  eval_goldstein        — residual/coverage/width/MSE per phase, one pass
                          (spect_cond_LC.py + evaluation.py + plot_metric.py)
  eval_masking          — LC-masking robustness sweep (gradual_masking.py)
  eval_regression       — |error|/sigma              (eval_paramregression.py)
  try_models            — qualitative figures        (try_*.py)

Each driver runs standalone (`python -m vaesne_tpu.experiments.<name>`),
falls back to synthetic contract-shaped data when no npz path is given, and
accepts `key=value` config overrides.
"""
