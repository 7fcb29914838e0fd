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


def env_flag(name: str, default: bool) -> bool:
    """Trace-time boolean env knob: anything but ``0``/``false``/``False``
    is true. The single parse shared by every VAESNE_* flag."""
    env = os.environ.get(name)
    if env is None:
        return default
    return env not in ("0", "false", "False")


def use_pallas() -> bool:
    return env_flag("VAESNE_PALLAS", jax.default_backend() == "tpu")


def pallas_interpret() -> bool:
    """Run the production Pallas dispatch path under ``interpret=True``
    (``VAESNE_PALLAS_INTERPRET=1``). For tests only: lets a CPU host execute
    the exact kernel code the TPU runs — e.g. the virtual-8-device sharding
    suite exercising the custom-partitioning wrappers — at interpreted-mode
    speed. Production TPU runs leave this unset (compiled kernels)."""
    return env_flag("VAESNE_PALLAS_INTERPRET", False)
