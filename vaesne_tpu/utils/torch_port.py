"""Import PyTorch-reference weights into this framework's flax params.

Enables golden-parity testing (and migration of user-trained reference
models): a reference ``state_dict`` (from ``torch.save(model.state_dict())``
or extracted from a whole-module pickle) converts into the exact flax param
pytree of the corresponding ``vaesne_tpu`` model, so both frameworks compute
the same function up to float arithmetic.

Mapping rules (torch name → flax name, values transposed where layouts
differ):
  * ``nn.Linear``:  weight [out,in] → Dense ``kernel`` = weightᵀ, bias → bias
  * ``nn.Embedding``: weight → Embed ``embedding``
  * ``nn.LayerNorm``: weight/bias → scale/bias
  * ``nn.MultiheadAttention``: packed ``in_proj_weight`` [3E,E] splits into
    q/k/v Dense kernels (each transposed); ``out_proj`` as Linear
  * reference ``MLP`` (Sequential ``mlp.{0,2,...}``) → ``hidden_i``/``out``
  * reference ``singlelayerMLP`` (fc1, fc2) → same names
  * reference ``SinusoidalMLPPositionalEmbedding`` (fc1, fc2) → same names
  * ``TransformerBlock``: reference util_layers.py:257-309 → ``nn.layers``
    block (self_attn, cross_attn, [context_self_attn], layernorm1/2/3,
    ffn.0/ffn.2 → ffn_0/ffn_2)

All converters take a flat ``{torch_name: np.ndarray}`` dict (call
``numpy_state_dict`` on a torch state_dict first) and a name prefix.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

Flat = Dict[str, np.ndarray]


def numpy_state_dict(state_dict) -> Flat:
    """torch state_dict → {name: np.ndarray} (detached, on host)."""
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state_dict.items()}


def _linear(sd: Flat, p: str):
    return {"kernel": sd[f"{p}.weight"].T, "bias": sd[f"{p}.bias"]}


def _layernorm(sd: Flat, p: str):
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def _embedding(sd: Flat, p: str):
    return {"embedding": sd[f"{p}.weight"]}


def _mha(sd: Flat, p: str):
    w = sd[f"{p}.in_proj_weight"]  # [3E, E]
    b = sd[f"{p}.in_proj_bias"]  # [3E]
    e = w.shape[1]
    return {
        "q_proj": {"kernel": w[:e].T, "bias": b[:e]},
        "k_proj": {"kernel": w[e : 2 * e].T, "bias": b[e : 2 * e]},
        "v_proj": {"kernel": w[2 * e :].T, "bias": b[2 * e :]},
        "out_proj": _linear(sd, f"{p}.out_proj"),
    }


def _single_layer_mlp(sd: Flat, p: str):
    return {"fc1": _linear(sd, f"{p}.fc1"), "fc2": _linear(sd, f"{p}.fc2")}


def _sin_mlp_embedding(sd: Flat, p: str):
    return {"fc1": _linear(sd, f"{p}.fc1"), "fc2": _linear(sd, f"{p}.fc2")}


def _mlp(sd: Flat, p: str):
    """Reference MLP: Sequential Linear/ReLU pairs + final Linear
    (util_layers.py:20-34) → {hidden_i, out}."""
    idxs = sorted(
        {int(k[len(p) + 5 :].split(".")[0]) for k in sd if k.startswith(f"{p}.mlp.")}
    )
    out = {}
    for n, i in enumerate(idxs[:-1]):
        out[f"hidden_{n}"] = _linear(sd, f"{p}.mlp.{i}")
    out["out"] = _linear(sd, f"{p}.mlp.{idxs[-1]}")
    return out


def _transformer_block(sd: Flat, p: str):
    out = {
        "self_attn": _mha(sd, f"{p}.self_attn"),
        "cross_attn": _mha(sd, f"{p}.cross_attn"),
        "layernorm1": _layernorm(sd, f"{p}.layernorm1"),
        "layernorm2": _layernorm(sd, f"{p}.layernorm2"),
        "layernorm3": _layernorm(sd, f"{p}.layernorm3"),
        "ffn_0": _linear(sd, f"{p}.ffn.0"),
        "ffn_2": _linear(sd, f"{p}.ffn.2"),
    }
    if f"{p}.context_self_attn.in_proj_weight" in sd:
        out["context_self_attn"] = _mha(sd, f"{p}.context_self_attn")
        out["layernorm_context"] = _layernorm(sd, f"{p}.layernorm_context")
    return out


def _blocks(sd: Flat, p: str):
    n = len({k.split(".")[len(p.split("."))] for k in sd if k.startswith(f"{p}.")})
    return {f"block_{i}": _transformer_block(sd, f"{p}.{i}") for i in range(n)}


def convert_photometric_encoder(sd: Flat, p: str = "enc.inference_transformer"):
    """photometricTransformerEncoder (PhotometricLayers.py:72-143) →
    PhotometricTransformerEncoder params."""
    out = {
        "initbottleneck": sd[f"{p}.initbottleneck"],
        "bottleneckfc": _single_layer_mlp(sd, f"{p}.bottleneckfc"),
        "blocks": _blocks(sd, f"{p}.transformerblocks"),
        "bandembd": _embedding(sd, f"{p}.bandembd"),
        "fluxfc": _linear(sd, f"{p}.fluxfc"),
    }
    if f"{p}.time_embd.fc1.weight" in sd:  # concat=True → MLP time embedding
        out["time_embd"] = _sin_mlp_embedding(sd, f"{p}.time_embd")
        out["LCfc"] = _mlp(sd, f"{p}.LCfc")
    return out


def convert_photometric_decoder(sd: Flat, p: str = "dec.generativetransformer"):
    """photometricTransformerDecoder (PhotometricLayers.py:10-69)."""
    return {
        "blocks": _blocks(sd, f"{p}.transformerblocks"),
        "sinusoidal_time_embd": _sin_mlp_embedding(sd, f"{p}.sinusoidal_time_embd"),
        "bandembd": _embedding(sd, f"{p}.bandembd"),
        "contextfc": _mlp(sd, f"{p}.contextfc"),
        "get_photo": _single_layer_mlp(sd, f"{p}.get_photo"),
    }


def convert_spectra_encoder(sd: Flat, p: str = "enc.inference_transformer"):
    """spectraTransformerEncoder (SpectraLayers.py:66-139)."""
    out = {
        "initbottleneck": sd[f"{p}.initbottleneck"],
        "bottleneckfc": _single_layer_mlp(sd, f"{p}.bottleneckfc"),
        "blocks": _blocks(sd, f"{p}.transformerblocks"),
        "flux_embd": _linear(sd, f"{p}.flux_embd"),
        "phase_embd": _sin_mlp_embedding(sd, f"{p}.phase_embd_layer"),
    }
    if f"{p}.spectrafc.mlp.0.weight" in sd:  # concat=True
        out["spectrafc"] = _mlp(sd, f"{p}.spectrafc")
        # concat → plain sinusoidal wavelength embedding (no params)
    else:
        out["wavelength_embd"] = _sin_mlp_embedding(sd, f"{p}.wavelength_embd_layer")
    return out


def convert_spectra_decoder(sd: Flat, p: str = "dec.generativetransformer"):
    """spectraTransformerDecoder (SpectraLayers.py:11-63)."""
    return {
        "blocks": _blocks(sd, f"{p}.transformerblocks"),
        "wavelength_embd_layer": _sin_mlp_embedding(sd, f"{p}.wavelength_embd_layer"),
        "phase_embd_layer": _sin_mlp_embedding(sd, f"{p}.phase_embd_layer"),
        "contextfc": _mlp(sd, f"{p}.contextfc"),
        "get_flux": _single_layer_mlp(sd, f"{p}.get_flux"),
    }


def convert_photometric_vae(state_dict) -> dict:
    """Reference ``PhotometricVAE``/``BrightPhotometricVAE`` state_dict →
    flax params (the Bright variant's brightnessfc MLP is detected by key,
    PhotometricVAE.py:285)."""
    sd = _as_numpy(state_dict)
    out = {
        "enc": convert_photometric_encoder(sd),
        "dec": convert_photometric_decoder(sd),
    }
    if "brightnessfc.mlp.0.weight" in sd:
        out["brightnessfc"] = _mlp(sd, "brightnessfc")
    return out


def convert_spectra_vae(state_dict) -> dict:
    """Reference ``SpectraVAE``/``BrightSpectraVAE`` state_dict → flax params
    (Bright brightnessfc detected by key, SpectraVAE.py:268)."""
    sd = _as_numpy(state_dict)
    out = {
        "enc": convert_spectra_encoder(sd),
        "dec": convert_spectra_decoder(sd),
    }
    if "brightnessfc.mlp.0.weight" in sd:
        out["brightnessfc"] = _mlp(sd, "brightnessfc")
    return out


def convert_photospec_mmvae(state_dict) -> dict:
    """Reference ``photospecMMVAE.state_dict()`` → flax params for
    ``vaesne_tpu.models.PhotoSpecMMVAE`` (vaes.0 = photometry, vaes.1 =
    spectra — mmVAE.py:71-84)."""
    sd = _as_numpy(state_dict)
    photo = {k[len("vaes.0."):]: v for k, v in sd.items() if k.startswith("vaes.0.")}
    spec = {k[len("vaes.1."):]: v for k, v in sd.items() if k.startswith("vaes.1.")}
    return {
        "vaes_0": convert_photometric_vae(photo),
        "vaes_1": convert_spectra_vae(spec),
    }


def _conv2d(sd: Flat, p: str):
    """torch Conv2d weight [out,in,kh,kw] → flax Conv kernel [kh,kw,in,out]."""
    return {"kernel": sd[f"{p}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{p}.bias"]}


def convert_hostimg_encoder(sd: Flat, p: str = "enc.inference_transformer"):
    """HostImgTransformerEncoder (ImageLayers.py:6-60). The default 2D
    sin-cos position table is a computed buffer on both sides (no params)."""
    out = {
        "initbottleneck": sd[f"{p}.initbottleneck"],
        "patch_embed": {"proj": _conv2d(sd, f"{p}.patch_embed.proj")},
        "bottleneckfc": _single_layer_mlp(sd, f"{p}.bottleneckfc"),
        "blocks": _blocks(sd, f"{p}.transformerblocks"),
    }
    if f"{p}.pos_embed" in sd:  # learnable (sincosin=False) variant
        out["pos_embed"] = sd[f"{p}.pos_embed"][0]
    if f"{p}.eventloc_embd.fc1.weight" in sd:
        out["eventloc_embd"] = _sin_mlp_embedding(sd, f"{p}.eventloc_embd")
    return out


def convert_hostimg_decoder(sd: Flat, p: str = "dec.generativetransformer"):
    """HostImgTransformerDecoder / ...Hybrid (ImageLayers.py:63-110,116-180);
    the hybrid variant is detected by its final_refine conv stack."""
    out = {
        "contextfc": _mlp(sd, f"{p}.contextfc"),
        "blocks": _blocks(sd, f"{p}.transformerblocks"),
    }
    if f"{p}.final_refine.0.weight" in sd:  # hybrid
        out["decoder"] = _linear(sd, f"{p}.decoder")
        out["refine_0"] = _conv2d(sd, f"{p}.final_refine.0")
        out["refine_1"] = _conv2d(sd, f"{p}.final_refine.2")
    elif f"{p}.decoder.mlp.0.weight" in sd:  # per-pixel MLP decoder
        out["decoder"] = _mlp(sd, f"{p}.decoder")
    else:  # per-pixel Linear decoder
        out["decoder"] = _linear(sd, f"{p}.decoder")
    return out


def convert_hostimg_vae(state_dict) -> dict:
    """Reference ``HostImgVAE.state_dict()`` → flax params for
    ``vaesne_tpu.models.HostImgVAE``."""
    sd = _as_numpy(state_dict)
    return {
        "enc": convert_hostimg_encoder(sd),
        "dec": convert_hostimg_decoder(sd),
    }


def convert_contrastive(state_dict) -> dict:
    """Reference ``ContraPhotSpec.state_dict()`` → flax params for
    ``vaesne_tpu.models.ContraPhotSpec`` (towers reuse the modality encoders,
    contrastiveNets.py:48-77)."""
    sd = _as_numpy(state_dict)
    return {
        "photometry_encoder": convert_photometric_encoder(sd, "photometry_encoder"),
        "photo_proj": _single_layer_mlp(sd, "photo_proj"),
        "spectra_encoder": convert_spectra_encoder(sd, "spectra_encoder"),
        "spectra_proj": _single_layer_mlp(sd, "spectra_proj"),
    }


def _as_numpy(state_dict) -> Flat:
    if isinstance(state_dict, dict) and all(
        isinstance(v, np.ndarray) for v in state_dict.values()
    ):
        return state_dict
    return numpy_state_dict(state_dict)


# -- whole-module pickle import (VERDICT r3 #5) --------------------------
#
# The reference ships checkpoints as WHOLE-MODULE pickles —
# ``torch.save(model)`` loaded with ``torch.load(..., weights_only=False)``
# (spect_cond_LC.py:75-82, try_photospectra_model.py:45-52) — which can only
# unpickle with the original ``VAESNe`` package importable. These helpers
# make that the first step of a migration: pickle → state_dict → the
# converters above → flax params.

_PICKLE_CONVERTERS = {
    # reference class name → (converter, vaesne_tpu model family)
    "photospecMMVAE": ("convert_photospec_mmvae", "PhotoSpecMMVAE"),
    "MMVAE": ("convert_photospec_mmvae", "PhotoSpecMMVAE"),
    "SpectraVAE": ("convert_spectra_vae", "SpectraVAE"),
    "BrightSpectraVAE": ("convert_spectra_vae", "BrightSpectraVAE"),
    "PhotometricVAE": ("convert_photometric_vae", "PhotometricVAE"),
    "BrightPhotometricVAE": ("convert_photometric_vae", "BrightPhotometricVAE"),
    "HostImgVAE": ("convert_hostimg_vae", "HostImgVAE"),
    "ContraPhotSpec": ("convert_contrastive", "ContraPhotSpec"),
}


def load_reference_pickle(path: str, package_path: str | None = None):
    """Load a reference whole-module pickle; returns (flat numpy state_dict,
    reference class name).

    .. warning:: **Only run this on checkpoint files you trust.** The
       reference saves whole ``nn.Module`` pickles (test_photospectra.py:153),
       which can only be loaded with ``torch.load(weights_only=False)`` —
       unpickling EXECUTES arbitrary code embedded in the file, and resolving
       the pickle's class references imports (i.e. executes) the reference
       ``VAESNe`` package from ``package_path``. A plain
       ``torch.save(model.state_dict())`` file avoids both: it loads without
       any package on ``sys.path`` and is the format to ask collaborators
       for. See MIGRATING.md "Security note".

    ``package_path``: directory containing the ``VAESNe`` package so the
    pickle's class references resolve (default: ``$VAESNE_REFERENCE`` or the
    conventional ``/root/reference/package``). Also accepts pickles that are
    already plain state_dicts (``torch.save(model.state_dict())``), for
    which no package import is needed — then the class name is ``None``.
    """
    import os
    import sys

    import torch

    pkg = package_path or os.environ.get("VAESNE_REFERENCE",
                                         "/root/reference/package")
    added = False
    if pkg and os.path.isdir(pkg) and pkg not in sys.path:
        sys.path.insert(0, pkg)
        added = True
    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        if added:
            sys.path.remove(pkg)
    if hasattr(obj, "state_dict"):
        return numpy_state_dict(obj.state_dict()), type(obj).__name__
    if isinstance(obj, dict):
        return _as_numpy(obj), None
    raise TypeError(
        f"{path} unpickled to {type(obj).__name__}; expected an nn.Module "
        "or a state_dict")


def import_reference_pickle(path: str, package_path: str | None = None,
                            class_name: str | None = None) -> dict:
    """One-call migration: reference whole-module pickle → flax params.

    Dispatches on the pickled module's class (or an explicit ``class_name``
    for plain-state_dict pickles). The returned pytree loads directly into
    the matching ``vaesne_tpu`` model built with the SAME hyperparameters
    the reference model was constructed with (the reference encodes them in
    its checkpoint filename — SURVEY §5.4; they are not recoverable from the
    weights alone except via shapes)."""
    sd, cls = load_reference_pickle(path, package_path)
    cls = class_name or cls
    if cls is None:
        raise ValueError(
            f"{path} is a bare state_dict; pass class_name= (one of "
            f"{sorted(_PICKLE_CONVERTERS)}) to pick the converter")
    if cls not in _PICKLE_CONVERTERS:
        raise ValueError(
            f"no converter for reference class {cls!r}; supported: "
            f"{sorted(_PICKLE_CONVERTERS)}")
    conv_name, _ = _PICKLE_CONVERTERS[cls]
    return globals()[conv_name](sd)
