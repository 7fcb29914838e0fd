"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding paths run in CI without TPU hardware via XLA's
host-platform device-count override — the standard JAX analog of
"multi-node testing without a cluster". Must be set before jax imports.
"""

import os

# Force CPU even when the session presets JAX_PLATFORMS (e.g. axon/TPU):
# the suite depends on 8 virtual devices and fp32 determinism. NB the env
# var alone does NOT stick under the axon plugin — the config.update below
# is the authoritative override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache (works for the CPU backend too): the suite is
# compile-dominated on a small host, so warm reruns skip nearly all of it.
# Lives under tests/ (gitignored) and survives between runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# Stable cache keys for programs containing custom_partitioning ops
# (ops/partition.py wraps the Pallas kernels): the wrapper embeds a
# process-local callback pointer in the HLO, which would otherwise make
# every pytest process miss the persistent cache.
jax.config.update("jax_remove_custom_partitioning_ptr_from_cache_key", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def make_photometry_batch(rng, B=4, L=60, num_bands=6):
    """Goldstein-shaped photometry tuple (flux, time, band, mask)."""
    import jax.numpy as jnp

    flux = jnp.asarray(rng.normal(size=(B, L)), jnp.float32)
    time = jnp.asarray(np.sort(rng.uniform(-1, 1, size=(B, L)), axis=1), jnp.float32)
    band = jnp.asarray(rng.integers(0, num_bands, size=(B, L)), jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(B, L)) < 0.2)
    return (flux, time, band, mask)


def make_spectra_batch(rng, B=4, N=96):
    """Goldstein-shaped spectra tuple (flux, wavelength, phase, mask)."""
    import jax.numpy as jnp

    flux = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
    wl = jnp.asarray(np.linspace(-1, 1, N)[None].repeat(B, 0), jnp.float32)
    phase = jnp.asarray(rng.normal(size=(B,)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, N)) < 0.2)
    return (flux, wl, phase, mask)


@pytest.fixture
def photometry_batch(rng):
    return make_photometry_batch(rng)


@pytest.fixture
def spectra_batch(rng):
    return make_spectra_batch(rng)


@pytest.fixture
def multimodal_batch(rng):
    return (make_photometry_batch(rng), make_spectra_batch(rng))
