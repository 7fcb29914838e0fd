"""Kernel dispatch policy: Pallas on TPU, pure XLA elsewhere.

The Pallas kernels in this package compile only for real TPU backends (they
can also run anywhere under ``interpret=True``, but interpreted execution is
for tests, not production). Layer code asks ``use_pallas()`` at trace time;
the env var ``VAESNE_PALLAS`` (``1``/``0``) overrides the automatic
backend-based choice in both directions.
"""

from __future__ import annotations

import os

import jax


def use_pallas() -> bool:
    env = os.environ.get("VAESNE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"
