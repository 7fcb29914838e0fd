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

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

DEFAULT_BUCKETS = (8, 32, 128, 512)


def _pad_to(batch, size: int):
    """Pad every leaf's event axis up to ``size`` by repeating event 0."""

    def pad(a):
        n = a.shape[0]
        if n == size:
            return a
        reps = jnp.broadcast_to(a[:1], (size - n,) + a.shape[1:])
        return jnp.concatenate([a, reps], axis=0)

    return jax.tree_util.tree_map(pad, batch)


class InferenceServer:
    """Serve a trained (MM)VAE with compile-once bucketed programs.

    ``model`` is a flax module (``PhotoSpecMMVAE`` or any ``MMVAE``);
    ``variables`` its trained variables. Sampling keys are drawn from a
    host-side chain seeded with ``seed`` — pass ``key=`` explicitly for
    reproducible single calls.
    """

    def __init__(self, model, variables, *,
                 buckets: Sequence[int] = DEFAULT_BUCKETS, seed: int = 0):
        if not buckets or sorted(buckets) != list(buckets):
            raise ValueError(f"buckets must be ascending, got {buckets}")
        self._model = model
        self._variables = variables
        self._buckets = tuple(int(b) for b in buckets)
        self._programs: Dict[tuple, callable] = {}
        self._key = jax.random.PRNGKey(seed)
        self.hits = 0
        self.compiles = 0

    @classmethod
    def from_checkpoint(cls, path: str, **kwargs) -> "InferenceServer":
        """Serve a flagship MMVAE checkpoint directory: rebuild the EXACT
        trained architecture from its ``config.json`` (written by
        ``train_loop``) and restore the params."""
        from .data import make_goldstein_like, multimodal_tuple
        from .experiments.common import optimizer_from_config
        from .experiments.train_photospectra import build_model
        from .training import TrainState, init_model
        from .utils.checkpoint import restore_checkpoint, restore_config
        from .utils.config import PhotoSpectraMMVAEConfig

        cfg = restore_config(path, PhotoSpectraMMVAEConfig)
        if cfg is None:
            cfg = PhotoSpectraMMVAEConfig()
        model = build_model(cfg)
        example = multimodal_tuple(make_goldstein_like(n=2, seed=0))
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
        fn = self._programs.get(key)
        if fn is None:
            fn = jax.jit(build())
            self._programs[key] = fn
            self.compiles += 1
        else:
            self.hits += 1
        return fn

    def _next_key(self, key: Optional[Array]) -> Array:
        if key is not None:
            return key
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- tasks -------------------------------------------------------------

    def crossmodal(self, x_in, x_out, direction: Tuple[int, int] = (0, 1),
                   K: int = 1, key: Optional[Array] = None) -> Array:
        """Cross-modal generation (e.g. LC → spectrum): ``[K, B, grid]`` of
        decoded means on ``x_out``'s grids (mmVAE.py:128 intent)."""
        n = jax.tree_util.tree_leaves(x_in)[0].shape[0]
        k = self._next_key(key)

        def build():
            def run(variables, x_in, x_out, k):
                return self._model.apply(
                    variables, x_in, x_out, direction=direction, K=K,
                    method="crossmodgen", rngs={"sample": k})
            return run

        bucket = self._bucket_for(n)
        fn = self._program("crossmodal", (direction, K, bucket), build)
        out = fn(self._variables, _pad_to(x_in, bucket),
                 _pad_to(x_out, bucket), k)
        return out[:, :n]

    def crossmodal_ci(self, x_in, x_out, direction: Tuple[int, int] = (0, 1),
                      K: int = 100, alpha: float = 0.1,
                      key: Optional[Array] = None):
        """(mean, lo, hi): posterior-predictive mean and the (1−alpha) CI
        band over K posterior samples — the reference's eval-harness summary
        (evaluation.py:4-13, alpha_level=0.1) as one on-device program."""
        n = jax.tree_util.tree_leaves(x_in)[0].shape[0]
        k = self._next_key(key)

        def build():
            def run(variables, x_in, x_out, k):
                draws = self._model.apply(
                    variables, x_in, x_out, direction=direction, K=K,
                    method="crossmodgen", rngs={"sample": k})
                qs = jnp.quantile(
                    draws, jnp.array([alpha / 2, 1 - alpha / 2]), axis=0)
                return draws.mean(0), qs[0], qs[1]
            return run

        bucket = self._bucket_for(n)
        fn = self._program("crossmodal_ci", (direction, K, alpha, bucket),
                           build)
        mean, lo, hi = fn(self._variables, _pad_to(x_in, bucket),
                          _pad_to(x_out, bucket), k)
        return mean[:n], lo[:n], hi[:n]

    def embed(self, x, modality: int = 0) -> Array:
        """Posterior-mean latent embeddings ``[B, latent_len, latent_dim]``
        for one modality — the representation the regression heads consume
        (regression.py:17-26)."""
        n = jax.tree_util.tree_leaves(x)[0].shape[0]

        def build():
            def run(variables, x):
                # encode(mean=True) returns the posterior mean directly
                return self._model.vaes[modality].apply(
                    {"params": variables["params"][f"vaes_{modality}"]},
                    x, method="encode")
            return run

        bucket = self._bucket_for(n)
        fn = self._program("embed", (modality, bucket), build)
        return fn(self._variables, _pad_to(x, bucket))[:n]

    def reconstruct(self, x, K: int = 1, key: Optional[Array] = None):
        """M×M matrix of posterior-mean reconstructions (mmVAE.py:120-126)."""
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
        padded = tuple(_pad_to(m, bucket) for m in x)
        out = fn(self._variables, padded, k)
        # each entry is [K, B, ...] decoded means; drop the pad rows on B
        return [[np.asarray(col[:, :n]) for col in row] for row in out]

    def stats(self) -> Dict[str, int]:
        return {"programs": len(self._programs), "compiles": self.compiles,
                "hits": self.hits}
