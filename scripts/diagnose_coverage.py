"""Diagnose the flagship's low CI coverage (VERDICT r3 #2).

The shipped 400-epoch flagship eval shows a 90% CI covering only 14.3% of
ground truth (artifacts/eval/avg_metrics.npz). Three hypotheses:
  (a) the K-sample CI machinery is wrong;
  (b) the port's training dynamics produce an overconfident posterior the
      reference would not;
  (c) it is inherent to the METHOD: the reference's "CI" is the spread of
      K decoder MEANS (mmVAE.py:120-126 returns px_z means) — latent-only
      uncertainty with a FIXED unit likelihood scale (SpectraVAE.py:84-86:
      scale = 1 + 1e10·mask, i.e. 1.0 on observed bins, never learned) —
      so nothing constrains that band to cover 90%.

This script settles all three:
  1. ``ci-check``: K=100 draws from a KNOWN Laplace predictive through the
     exact ``get_metric`` pipeline → coverage must be ≈ 0.9. Tests (a).
  2. ``train-both``: same init (torch init, imported through torch_port),
     same data (synthetic Goldstein npz), same batch order, parity
     optimizer settings; the TORCH side trains with the live reference
     (losses.m_iwae + torch AdamW), ours with the fused JAX step. Each
     side's params at matched epochs are evaluated through the SAME
     K=100 reconstruction + coverage pipeline (torch params converted via
     torch_port — forward parity is golden-tested to ~1e-7, so this
     isolates TRAINING dynamics, hypothesis (b), while keeping the slow
     CPU reference to training only).
  3. The final JAX eval also reports the latent-only band width vs the
     residual sd and the coverage a FULL-predictive band (decoder mean +
     Laplace(0,1) observation noise, the model's actual likelihood) would
     achieve — quantifying hypothesis (c).

Usage:
  python scripts/diagnose_coverage.py ci-check
  python scripts/diagnose_coverage.py jax   [epochs=30] [n=96]
  python scripts/diagnose_coverage.py torch [epochs=30] [n=96]
  python scripts/diagnose_coverage.py report            # merge JSONs

Outputs artifacts/coverage_diag_{jax,torch}.json and prints a summary.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("VAESNE_BF16", "0")  # calibration runs are fp32

import numpy as np

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "artifacts"
EVAL_EPOCHS = (2, 5, 10, 20, 30)
DIMS = dict(latent_len=4, latent_dim=4, model_dim=32, num_heads=4, ff_dim=32,
            num_layers=4)  # the flagship dims (test_photospectra.py:102-131)
B, K, LR = 16, 2, 1e-4  # test_photospectra.py:93-95,142-144
K_EVAL = 100            # spect_cond_LC.py:103


def _data(n, seed=0):
    from vaesne_tpu.data import make_goldstein_like, multimodal_tuple

    d = make_goldstein_like(n=n, seed=seed)
    tr = np.asarray(d["training_idx"])
    te = np.asarray(d["testing_idx"])
    train_np = _np_tuple(d, tr)
    test_np = _np_tuple(d, te)
    gt = np.asarray(d["flux"])[te]
    return d, train_np, test_np, gt


def _np_tuple(d, idx):
    photo = (
        np.asarray(d["photoflux"])[idx].astype(np.float32),
        np.asarray(d["phototime"])[idx].astype(np.float32),
        np.asarray(d["photowavelength"])[idx].astype(np.int64),
        (np.asarray(d["photomask"])[idx] == 0),
    )
    spec = (
        np.asarray(d["flux"])[idx].astype(np.float32),
        np.asarray(d["wavelength"])[idx].astype(np.float32),
        np.asarray(d["phase"])[idx].astype(np.float32),
        (np.asarray(d["mask"])[idx] == 0),
    )
    return photo, spec


def _batch_order(n_train, epochs, seed=123):
    """Identical shuffle stream for both frameworks."""
    rng = np.random.default_rng(seed)
    orders = []
    steps = n_train // B
    for _ in range(epochs):
        perm = rng.permutation(n_train)[: steps * B]
        orders.append(perm.reshape(steps, B))
    return orders


def _take(tup, idx):
    return tuple(a[idx] for a in tup)


def ci_check():
    """Hypothesis (a): the CI pipeline itself."""
    from vaesne_tpu.evaluation.metrics import get_metric

    rng = np.random.default_rng(0)
    Bt, N = 64, 200
    loc = rng.normal(size=(Bt, N))
    scale = 0.5 + rng.uniform(size=(Bt, N))
    # K draws from the TRUE Laplace predictive; gt an independent draw
    u = rng.uniform(-0.5 + 1e-9, 0.5, size=(K_EVAL, Bt, N))
    draws = loc - scale * np.sign(u) * np.log1p(-2 * np.abs(u))
    ug = rng.uniform(-0.5 + 1e-9, 0.5, size=(Bt, N))
    gt = loc - scale * np.sign(ug) * np.log1p(-2 * np.abs(ug))
    _, cover, width = get_metric(draws, gt, alpha_level=0.1)
    cov = float(cover.mean())
    print(json.dumps({"ci_pipeline_coverage": round(cov, 4),
                      "nominal": 0.9,
                      "pass": bool(abs(cov - 0.9) < 0.02)}))
    assert abs(cov - 0.9) < 0.02, "CI machinery broken"


def _eval_params_through_jax(params_list, test_np, gt, tag):
    """K=100 LC→spec reconstruction + coverage for each params pytree."""
    import jax

    from vaesne_tpu.evaluation.metrics import get_metric
    from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE

    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, **DIMS), SpectraVAE(**DIMS)],
        beta=1.0)

    def to_j(mod):
        import jax.numpy as jnp

        f, a, b, m = mod
        sec = jnp.asarray(b, jnp.int32) if b.dtype.kind == "i" else jnp.asarray(b)
        return (jnp.asarray(f), jnp.asarray(a), sec, jnp.asarray(m))

    test_j = (to_j(test_np[0]), to_j(test_np[1]))
    recon_fn = jax.jit(lambda v, x, k: model.apply(
        v, x, K_EVAL, method="reconstruct", rngs={"sample": k})[0][1])

    rows = []
    for epoch, params in params_list:
        rec = np.asarray(recon_fn({"params": params}, test_j,
                                  jax.random.PRNGKey(7)))
        _, cover, width = get_metric(rec, gt, alpha_level=0.1)
        resi = gt - np.nanmean(rec, 0)
        # full-predictive band: decoder means + Laplace(0,1) observation
        # noise (the model's actual likelihood on observed bins)
        rng = np.random.default_rng(11)
        u = rng.uniform(-0.5 + 1e-9, 0.5, size=rec.shape)
        rec_noisy = rec - np.sign(u) * np.log1p(-2 * np.abs(u))
        _, cover_full, width_full = get_metric(rec_noisy, gt, alpha_level=0.1)
        rows.append({
            "epoch": epoch,
            "coverage_latent_only": round(float(cover.mean()), 4),
            "width_latent_only": round(float(np.nanmean(width)), 4),
            "residual_sd": round(float(np.nanstd(resi)), 4),
            "coverage_full_predictive": round(float(cover_full.mean()), 4),
            "width_full_predictive": round(float(np.nanmean(width_full)), 4),
        })
        print(f"[{tag}] epoch {epoch}: {rows[-1]}", flush=True)
    return rows


def _shared_init():
    """Torch init → (state_dict for torch, converted flax params)."""
    import torch

    REF = os.environ.get("VAESNE_REFERENCE", "/root/reference/package")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from VAESNe.PhotometricVAE import PhotometricVAE as TPhoto
    from VAESNe.SpectraVAE import SpectraVAE as TSpec
    from VAESNe.mmVAE import photospecMMVAE as TMM

    torch.manual_seed(0)
    t_model = TMM(vaes=[TPhoto(num_bands=6, **DIMS), TSpec(**DIMS)], beta=1.0)
    return t_model


def run_jax(epochs, n):
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    from vaesne_tpu import objectives
    from vaesne_tpu.training import TrainState, adamw, make_train_step
    from vaesne_tpu.utils.torch_port import convert_photospec_mmvae
    from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE
    import jax.numpy as jnp

    d, train_np, test_np, gt = _data(n)
    t_model = _shared_init()
    params = convert_photospec_mmvae(t_model.state_dict())
    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, **DIMS), SpectraVAE(**DIMS)],
        beta=1.0)

    def loss_fn(m, variables, b, k):
        return objectives.m_iwae(m, variables, b, K=K, key=k,
                                 deterministic=False)

    opt = adamw(LR, grad_clip=None)  # parity: torch AdamW defaults
    state = TrainState.create(params, opt, jax.random.PRNGKey(42))
    step = make_train_step(model, opt, loss_fn)

    def to_j(mod):
        f, a, b, m = mod
        sec = jnp.asarray(b, jnp.int32) if b.dtype.kind == "i" else jnp.asarray(b)
        return (jnp.asarray(f), jnp.asarray(a), sec, jnp.asarray(m))

    train_j = (to_j(train_np[0]), to_j(train_np[1]))
    orders = _batch_order(train_np[0][0].shape[0], epochs)
    snapshots, losses = [], []
    for epoch, order in enumerate(orders, start=1):
        for idx in order:
            batch = (_take(train_j[0], idx), _take(train_j[1], idx))
            state, loss = step(state, batch)
        losses.append(float(loss))
        if epoch in EVAL_EPOCHS or epoch == epochs:
            snapshots.append((epoch, jax.device_get(state.params)))
        print(f"[jax] epoch {epoch}/{epochs} loss {losses[-1]:.2f}", flush=True)

    rows = _eval_params_through_jax(snapshots, test_np, gt, "jax")
    out = {"side": "jax", "epochs": epochs, "n": n, "rows": rows,
           "final_losses": losses[-3:]}
    OUT.mkdir(exist_ok=True)
    (OUT / "coverage_diag_jax.json").write_text(json.dumps(out, indent=1))
    print("wrote", OUT / "coverage_diag_jax.json")


def run_torch(epochs, n):
    import torch

    torch.set_num_threads(max(1, os.cpu_count()))
    d, train_np, test_np, gt = _data(n)
    t_model = _shared_init()  # also puts the reference package on sys.path
    from VAESNe.losses import m_iwae as torch_m_iwae
    t_model.train()
    opt = torch.optim.AdamW(t_model.parameters(), lr=LR)
    torch.manual_seed(42)

    def to_t(mod):
        f, a, b, m = mod
        sec = torch.tensor(b, dtype=torch.int64) if b.dtype.kind == "i" \
            else torch.tensor(b)
        return (torch.tensor(f), torch.tensor(a), sec, torch.tensor(m))

    train_t = (to_t(train_np[0]), to_t(train_np[1]))
    orders = _batch_order(train_np[0][0].shape[0], epochs)
    from vaesne_tpu.utils.torch_port import convert_photospec_mmvae

    snapshots, losses = [], []
    t0 = time.time()
    for epoch, order in enumerate(orders, start=1):
        for idx in order:
            ti = torch.tensor(idx)
            x = [tuple(a[ti] for a in train_t[0]),
                 tuple(a[ti] for a in train_t[1])]
            opt.zero_grad()
            loss = -torch_m_iwae(t_model, x, K=K)
            loss.backward()
            opt.step()
        losses.append(float(loss))
        if epoch in EVAL_EPOCHS or epoch == epochs:
            # save the CONVERTED (flax-layout, numpy) snapshot to disk as it
            # happens — evaluation runs later via `eval-torch` on the chip
            # (K=100 x 982-grid attention logits exceed host RAM on CPU)
            flat = {}
            _flatten(convert_photospec_mmvae(t_model.state_dict()), "", flat)
            snap_dir = OUT / "coverage_snaps"
            snap_dir.mkdir(parents=True, exist_ok=True)
            np.savez(snap_dir / f"torch_epoch{epoch}.npz", **flat)
            snapshots.append(epoch)
        print(f"[torch] epoch {epoch}/{epochs} loss {losses[-1]:.2f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    out = {"side": "torch", "epochs": epochs, "n": n,
           "snapshots": snapshots, "final_losses": losses[-3:],
           "losses": [round(x, 2) for x in losses]}
    OUT.mkdir(exist_ok=True)
    (OUT / "coverage_diag_torch_train.json").write_text(json.dumps(out, indent=1))
    print("wrote", OUT / "coverage_diag_torch_train.json")


def _flatten(tree, prefix, out):
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            _flatten(v, p, out)
        else:
            out[p] = np.asarray(v)


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def eval_torch(epochs, n):
    """Evaluate the saved torch-side snapshots (run on the chip)."""
    d, train_np, test_np, gt = _data(n)
    snap_dir = OUT / "coverage_snaps"
    params_list = []
    for f in sorted(snap_dir.glob("torch_epoch*.npz"),
                    key=lambda p: int(p.stem.split("epoch")[1])):
        with np.load(f) as z:
            params_list.append((int(f.stem.split("epoch")[1]),
                                _unflatten({k: z[k] for k in z.files})))
    rows = _eval_params_through_jax(params_list, test_np, gt, "torch")
    out = {"side": "torch", "epochs": epochs, "n": n, "rows": rows}
    (OUT / "coverage_diag_torch.json").write_text(json.dumps(out, indent=1))
    print("wrote", OUT / "coverage_diag_torch.json")


def report():
    sides = {}
    for s in ("jax", "torch"):
        p = OUT / f"coverage_diag_{s}.json"
        if p.exists():
            sides[s] = json.loads(p.read_text())
    print(json.dumps(sides, indent=1))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "ci-check"
    epochs, n = 30, 96
    for a in sys.argv[2:]:
        if a.startswith("epochs="):
            epochs = int(a.split("=")[1])
        elif a.startswith("n="):
            n = int(a.split("=")[1])
    if mode == "ci-check":
        ci_check()
    elif mode == "jax":
        run_jax(epochs, n)
    elif mode == "torch":
        run_torch(epochs, n)
    elif mode == "eval-torch":
        eval_torch(epochs, n)
    elif mode == "report":
        report()
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
