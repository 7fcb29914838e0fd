"""Low-latency serving for trained models: bucketed static-shape programs.

The reference's only inference story is offline SLURM job arrays over a
fixed test set (spect_cond_LC.sh ``--array=0-399``); it has no path for
serving requests of *varying* size. Under XLA every distinct input shape is
its own compiled program, so the naive approach — jit per request — would
recompile for every new batch size (ruinous through a remote compile
service, see PERFORMANCE.md "Tunnel compile economics").

TPU-native answer: a small ladder of static batch **buckets**. A request of
B events is padded (by repeating its first event) up to the nearest bucket,
runs through that bucket's cached compiled program, and the pad rows are
sliced off. Every model op is per-event independent (attention is within an
event; LayerNorm is per token), so pad rows cannot perturb real outputs —
pinned by ``tests/test_serving.py::test_pad_rows_do_not_leak``. After
warmup, any request size ≤ the top bucket reuses one of ``len(buckets)``
programs per (task, direction, K).

    server = InferenceServer(model, variables)            # or .from_checkpoint
    spec = server.crossmodal(photo_batch, spec_grids)     # LC → spectrum
    mean, lo, hi = server.crossmodal_ci(photo, grids, K=100)  # 90% CI bands
    z = server.embed(photo_batch, modality=0)             # posterior means

Throughput on one v5e chip at K=100: ~97 events/sec per batch-64 program
(BASELINE.md "Cross-modal generation latency") vs the reference's 400-CPU-job
harness for the same computation.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

DEFAULT_BUCKETS = (8, 32, 128, 512)

# Serializes program TRACES process-wide: a precision-pinned server scopes
# VAESNE_BF16 around its trace, and any other server tracing concurrently
# (even a default-precision one) must not read the flipped value.
_TRACE_ENV_LOCK = threading.Lock()

# checkpoint ``_config_class`` tag → (driver module with build_model,
# synthetic-data kind, modality-tuple builder name). Every restorable
# training config is servable; the per-task methods check model capability
# (crossmodal/reconstruct need an MMVAE, embed/encode work for any VAE).
_RESTORE_DISPATCH = {
    "PhotoSpectraMMVAEConfig": ("train_photospectra", "goldstein", "multimodal_tuple"),
    "ZTFMMVAEConfig": ("train_ztf_photospect", "ztf", "multimodal_tuple"),
    "SpectraVAEConfig": ("train_spectra", "goldstein", "spectra_tuple"),
    "ZTFSpectraConfig": ("train_ztf_spectra", "ztf", "spectra_tuple"),
    "PhotometryVAEConfig": ("train_photometry", "goldstein", "photometry_tuple"),
}


def _pad_to(batch, size: int):
    """Pad every leaf's event axis up to ``size`` by repeating event 0.

    Padding runs HOST-side (numpy): eager ``jnp`` pad ops dispatch one
    device program per leaf per op, which on a tunneled backend costs
    seconds per padded request (measured 2026-08-20: 6–9 s for a padded
    K=100 crossmodal call vs 0.66 s exact-bucket — scripts/
    bench_serving.py). A request is ≤ bucket-sized, so the numpy copy is
    sub-millisecond and the jitted program transfers it once at dispatch."""

    def pad(a):
        n = a.shape[0]
        if n == size:
            return a
        a_np = np.asarray(a)
        reps = np.broadcast_to(a_np[:1], (size - n,) + a_np.shape[1:])
        return np.concatenate([a_np, reps], axis=0)

    return jax.tree_util.tree_map(pad, batch)


class InferenceServer:
    """Serve a trained (MM)VAE with compile-once bucketed programs.

    ``model`` is a flax module (``PhotoSpecMMVAE`` or any ``MMVAE``);
    ``variables`` its trained variables. Sampling keys are drawn from a
    host-side chain seeded with ``seed`` — pass ``key=`` explicitly for
    reproducible single calls.
    """

    def __init__(self, model, variables, *,
                 buckets: Sequence[int] = DEFAULT_BUCKETS, seed: int = 0,
                 mesh=None, precision: Optional[str] = None):
        if not buckets or sorted(buckets) != list(buckets):
            raise ValueError(f"buckets must be ascending, got {buckets}")
        if precision not in (None, "fp32", "bf16"):
            raise ValueError(
                f"precision must be None, 'fp32' or 'bf16', got {precision!r}")
        self._precision = precision
        self._model = model
        self._buckets = tuple(int(b) for b in buckets)
        self._mesh = mesh
        if mesh is not None:
            from .parallel import DATA_AXIS, replicated

            n_data = mesh.shape[DATA_AXIS]
            bad = [b for b in self._buckets if b % n_data]
            if bad:
                raise ValueError(
                    f"buckets {bad} not divisible by the mesh data axis "
                    f"({n_data}); every padded request must shard evenly "
                    "over the event axis")
            # params live replicated on the mesh so each bucket program
            # runs SPMD with only the per-device event shard resident
            variables = jax.device_put(variables, replicated(mesh))
        self._variables = variables
        self._programs: Dict[tuple, callable] = {}
        self._key = jax.random.PRNGKey(seed)
        # online serving is multi-threaded: _next_key is a read-split-write
        # on shared state and _program a check-then-compile — both must be
        # atomic or two requests can sample with the identical key /
        # double-compile the same bucket program
        self._lock = threading.Lock()
        self.hits = 0
        self.compiles = 0

    @classmethod
    def from_checkpoint(cls, path: str, **kwargs) -> "InferenceServer":
        """Serve any trainable checkpoint directory: dispatch on the saved
        ``_config_class`` tag in ``config.json`` (written by ``train_loop``)
        to rebuild the EXACT trained architecture, then restore the params.

        Flagship + ZTF MMVAEs serve every task; unimodal spectra/photometry
        checkpoints serve ``embed``-style encoding (cross-modal tasks need
        an MMVAE and raise with a clear message)."""
        import importlib

        from . import data as data_mod
        from .data import make_goldstein_like, make_ztf_like
        from .experiments.common import optimizer_from_config
        from .training import TrainState, init_model
        from .utils.checkpoint import load_config, restore_checkpoint, restore_config
        from .utils.config import CONFIG_CLASSES

        raw = load_config(path)
        name = (raw or {}).get("_config_class", "PhotoSpectraMMVAEConfig")
        if name not in _RESTORE_DISPATCH:
            raise ValueError(
                f"checkpoint at {path} was trained as {name}, which has no "
                f"serving dispatch entry; servable: "
                f"{sorted(_RESTORE_DISPATCH)}")
        driver, kind, tuple_builder = _RESTORE_DISPATCH[name]
        cfg = restore_config(path, CONFIG_CLASSES[name])
        if cfg is None:
            cfg = CONFIG_CLASSES[name]()
        build_model = importlib.import_module(
            f".experiments.{driver}", __package__).build_model
        model = build_model(cfg)
        maker = make_ztf_like if kind == "ztf" else make_goldstein_like
        example = getattr(data_mod, tuple_builder)(maker(n=2, seed=0))
        key = jax.random.PRNGKey(0)
        params = init_model(model, example, key, K=1)
        template = TrainState.create(
            params, optimizer_from_config(cfg.train), key)
        params = restore_checkpoint(path, template).params
        return cls(model, {"params": params}, **kwargs)

    # -- internals ---------------------------------------------------------

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        raise ValueError(
            f"request of {n} events exceeds the largest serving bucket "
            f"{self._buckets[-1]}; split the request or construct the "
            f"server with larger buckets")

    def _program(self, name: str, static: tuple, build):
        """One compiled program per (task, static-config, bucket)."""
        key = (name,) + static
        with self._lock:
            fn = self._programs.get(key)
            if fn is None:
                fn = jax.jit(self._with_precision(build()))
                self._programs[key] = fn
                self.compiles += 1
            else:
                self.hits += 1
        return fn

    def _with_precision(self, fn):
        """Pin this server's compute precision at TRACE time.

        ``vaesne_tpu`` reads VAESNE_BF16 when the model functions are traced
        (``nn.layers.compute_dtype``); the wrapper scopes the env var to the
        traced body — which executes exactly once per program, on its first
        call — so a ``precision=`` server is independent of the process-wide
        setting. The trace lock is MODULE-level (``_TRACE_ENV_LOCK``) and
        taken by EVERY server's traces, precision-pinned or not: the env
        flip would otherwise race with a concurrent cold trace of any other
        server instance in the process, permanently caching a
        wrong-precision program for it."""
        import functools
        import os

        want = (None if self._precision is None
                else "1" if self._precision == "bf16" else "0")

        @functools.wraps(fn)
        def traced(*args, **kwargs):
            with _TRACE_ENV_LOCK:
                prev = os.environ.get("VAESNE_BF16")
                if want is not None:
                    os.environ["VAESNE_BF16"] = want
                try:
                    return fn(*args, **kwargs)
                finally:
                    if want is not None:
                        if prev is None:
                            os.environ.pop("VAESNE_BF16", None)
                        else:
                            os.environ["VAESNE_BF16"] = prev

        return traced

    def _next_key(self, key: Optional[Array]) -> Array:
        if key is not None:
            return key
        with self._lock:
            self._key, sub = jax.random.split(self._key)
        return sub

    def _place(self, batch, bucket: int):
        """Pad to the bucket and (on a mesh) shard the event axis over
        ``data`` so the bucket program runs SPMD across chips."""
        padded = _pad_to(batch, bucket)
        if self._mesh is not None:
            from .parallel import shard_batch

            padded = shard_batch(padded, self._mesh)
        return padded

    def _require_mmvae(self, task: str):
        if not hasattr(self._model, "vaes"):
            raise ValueError(
                f"{task} needs a multimodal (MMVAE) model; this server "
                f"holds a unimodal {type(self._model).__name__} — use "
                "embed()/reconstruct-style unimodal calls or serve an "
                "MMVAE checkpoint")

    def prewarm(
        self,
        example,
        tasks: Optional[Sequence[str]] = None,
        buckets: Optional[Sequence[int]] = None,
        Ks: Sequence[int] = (100,),
        directions: Sequence[Tuple[int, int]] = ((0, 1), (1, 0)),
        alpha: float = 0.1,
        predictive: Sequence[bool] = (False,),
        log: bool = False,
    ) -> Dict[str, float]:
        """Compile every (task × bucket × K × direction) program before the
        first real request.

        A cold bucket program costs one full XLA compile on first contact —
        measured ~60 s per program through a tunneled compile service and up
        to ~325 s for the largest K=100 programs (PERFORMANCE.md "Tunnel
        compile economics"); without prewarming, the FIRST request of each
        shape eats that stall. Call this at deploy time with one example
        event per modality; afterwards every request ≤ the top bucket is a
        cache hit.

        ``example``: a multimodal batch ``(photo_tuple, spec_tuple)`` (or a
        unimodal tuple for unimodal checkpoints) with ≥1 event — only its
        shapes/dtypes matter; event 0 is broadcast to every bucket size.
        Defaults: all buckets, K=100 (the eval fan-out), both directions,
        tasks appropriate to the model. Returns {program label: seconds},
        each timed to full device completion (a value is read back)."""
        multimodal = hasattr(self._model, "vaes")
        if tasks is None:
            tasks = (("crossmodal", "crossmodal_ci", "embed", "reconstruct")
                     if multimodal else ("embed",))
        bad = [t for t in tasks
               if t in ("crossmodal", "crossmodal_ci", "reconstruct")
               and not multimodal]
        if bad:
            raise ValueError(
                f"tasks {bad} need an MMVAE; this server holds a unimodal "
                f"{type(self._model).__name__}")
        buckets = self._buckets if buckets is None else tuple(buckets)
        unknown = [b for b in buckets if b not in self._buckets]
        if unknown:
            raise ValueError(
                f"prewarm buckets {unknown} are not server buckets "
                f"{self._buckets}; a compiled off-ladder program would "
                "never be hit")
        import time

        one = jax.tree_util.tree_map(lambda a: np.asarray(a)[:1], example)
        modalities = (range(len(self._model.vaes)) if multimodal else (0,))
        key = jax.random.PRNGKey(0)  # compile-only; values are discarded

        def sync(out):
            np.asarray(jax.tree_util.tree_leaves(out)[0])

        timings: Dict[str, float] = {}

        def run(label, fn):
            t0 = time.perf_counter()
            sync(fn())
            timings[label] = round(time.perf_counter() - t0, 3)
            if log:
                print(f"prewarm {label}: {timings[label]:.1f}s")

        for b in buckets:
            # pre-pad host-side to exactly b so _bucket_for lands on b
            padded = _pad_to(one, b)
            for task in tasks:
                if task == "embed":
                    for m in modalities:
                        x = padded[m] if multimodal else padded
                        run(f"embed[m={m},b={b}]",
                            lambda x=x: self.embed(x, modality=m))
                elif task == "reconstruct":
                    for K in Ks:
                        run(f"reconstruct[K={K},b={b}]",
                            lambda K=K: self.reconstruct(padded, K=K,
                                                         key=key))
                elif task in ("crossmodal", "crossmodal_ci"):
                    for e, d in directions:
                        for K in Ks:
                            for p in predictive:
                                x_in, x_out = padded[e], padded[d]
                                if task == "crossmodal":
                                    run(f"crossmodal[{e}->{d},K={K},b={b},"
                                        f"pred={p}]",
                                        lambda x_in=x_in, x_out=x_out, K=K,
                                        p=p: self.crossmodal(
                                            x_in, x_out, direction=(e, d),
                                            K=K, key=key, predictive=p))
                                else:
                                    run(f"crossmodal_ci[{e}->{d},K={K},"
                                        f"b={b},pred={p}]",
                                        lambda x_in=x_in, x_out=x_out, K=K,
                                        p=p: self.crossmodal_ci(
                                            x_in, x_out, direction=(e, d),
                                            K=K, alpha=alpha, key=key,
                                            predictive=p))
                else:
                    raise ValueError(f"unknown prewarm task {task!r}")
        return timings

    # -- tasks -------------------------------------------------------------

    def crossmodal(self, x_in, x_out, direction: Tuple[int, int] = (0, 1),
                   K: int = 1, key: Optional[Array] = None,
                   predictive: bool = False) -> Array:
        """Cross-modal generation (e.g. LC → spectrum): ``[K, B, grid]`` of
        decoded means on ``x_out``'s grids (mmVAE.py:128 intent);
        ``predictive=True`` samples each draw from the observed-point
        likelihood instead (see ``crossmodal_ci``)."""
        self._require_mmvae("crossmodal")
        n = jax.tree_util.tree_leaves(x_in)[0].shape[0]
        k = self._next_key(key)

        def build():
            def run(variables, x_in, x_out, k):
                return self._model.apply(
                    variables, x_in, x_out, direction=direction, K=K,
                    predictive=predictive,
                    method="crossmodgen", rngs={"sample": k})
            return run

        bucket = self._bucket_for(n)
        fn = self._program("crossmodal", (direction, K, bucket, predictive),
                           build)
        out = fn(self._variables, self._place(x_in, bucket),
                 self._place(x_out, bucket), k)
        return out[:, :n]

    def crossmodal_ci(self, x_in, x_out, direction: Tuple[int, int] = (0, 1),
                      K: int = 100, alpha: float = 0.1,
                      key: Optional[Array] = None, predictive: bool = False):
        """(mean, lo, hi): posterior mean and the (1−alpha) band over K
        posterior samples — the reference's eval-harness summary
        (evaluation.py:4-13, alpha_level=0.1) as one on-device program.

        ``predictive=False`` is the reference-semantics LATENT-ONLY band:
        the spread of K decoder MEANS, which is NOT a calibrated predictive
        interval (the likelihood scale never enters; measured coverage 0.143
        at nominal 0.9 — PARITY.md "CI coverage"). ``predictive=True``
        samples each of the K draws from the decoder likelihood on observed
        points (Laplace(loc, 1)), so the band covers at the nominal rate
        whenever the model's likelihood fits the data
        (tests/test_serving.py::test_predictive_band_calibrated)."""
        self._require_mmvae("crossmodal_ci")
        n = jax.tree_util.tree_leaves(x_in)[0].shape[0]
        k = self._next_key(key)

        def build():
            def run(variables, x_in, x_out, k):
                draws = self._model.apply(
                    variables, x_in, x_out, direction=direction, K=K,
                    predictive=predictive,
                    method="crossmodgen", rngs={"sample": k})
                qs = jnp.quantile(
                    draws, jnp.array([alpha / 2, 1 - alpha / 2]), axis=0)
                return draws.mean(0), qs[0], qs[1]
            return run

        bucket = self._bucket_for(n)
        fn = self._program("crossmodal_ci",
                           (direction, K, alpha, bucket, predictive), build)
        mean, lo, hi = fn(self._variables, self._place(x_in, bucket),
                          self._place(x_out, bucket), k)
        return mean[:n], lo[:n], hi[:n]

    def embed(self, x, modality: int = 0) -> Array:
        """Posterior-mean latent embeddings ``[B, latent_len, latent_dim]``
        for one modality — the representation the regression heads consume
        (regression.py:17-26)."""
        n = jax.tree_util.tree_leaves(x)[0].shape[0]
        multimodal = hasattr(self._model, "vaes")

        def build():
            def run(variables, x):
                # encode(mean=True) returns the posterior mean directly
                if multimodal:
                    return self._model.vaes[modality].apply(
                        {"params": variables["params"][f"vaes_{modality}"]},
                        x, method="encode")
                # unimodal checkpoint: the model IS the encoder's VAE
                return self._model.apply(variables, x, method="encode")
            return run

        bucket = self._bucket_for(n)
        fn = self._program("embed", (modality, bucket), build)
        return fn(self._variables, self._place(x, bucket))[:n]

    def reconstruct(self, x, K: int = 1, key: Optional[Array] = None):
        """M×M matrix of posterior-mean reconstructions (mmVAE.py:120-126)."""
        self._require_mmvae("reconstruct")
        n = jax.tree_util.tree_leaves(x[0])[0].shape[0]
        k = self._next_key(key)

        def build():
            def run(variables, x, k):
                return self._model.apply(variables, x, K,
                                         method="reconstruct",
                                         rngs={"sample": k})
            return run

        bucket = self._bucket_for(n)
        fn = self._program("reconstruct", (K, bucket), build)
        padded = tuple(self._place(m, bucket) for m in x)
        out = fn(self._variables, padded, k)
        # each entry is [K, B, ...] decoded means; drop the pad rows on B
        return [[np.asarray(col[:, :n]) for col in row] for row in out]

    def stats(self) -> Dict[str, int]:
        return {"programs": len(self._programs), "compiles": self.compiles,
                "hits": self.hits}
