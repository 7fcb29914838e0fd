"""Multi-device SPMD tests on the 8-virtual-device CPU mesh.

These validate the framework's distributed story (replacing the reference's
SLURM-array-only scale-out, SURVEY §2.4): data-parallel train steps produce
the same math as single-device, and sharded placement is honored.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaesne_tpu import objectives
from vaesne_tpu.models import PhotoSpecMMVAE, PhotometricVAE, SpectraVAE
from vaesne_tpu.parallel import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate_state,
    shard_batch,
)
from vaesne_tpu.training import TrainState, adamw, init_model, make_train_step

from conftest import make_photometry_batch, make_spectra_batch

SMALL = dict(latent_len=2, latent_dim=2, model_dim=16, num_heads=2, ff_dim=16,
             num_layers=1, dropout=0.0)


def test_eight_virtual_devices_present():
    assert jax.device_count() >= 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == jax.device_count()
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_shard_batch_placement(rng):
    mesh = make_mesh()
    batch = make_photometry_batch(rng, B=16)
    sharded = shard_batch(batch, mesh)
    assert sharded[0].sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)
    np.testing.assert_allclose(np.asarray(sharded[0]), np.asarray(batch[0]))


def test_shard_batch_indivisible_raises(rng):
    mesh = make_mesh()
    batch = make_photometry_batch(rng, B=6)  # 6 % 8 != 0
    with pytest.raises(ValueError):
        shard_batch(batch, mesh)


def test_data_parallel_step_matches_single_device(rng, key):
    """The same jitted step on a sharded batch must produce (numerically)
    the same loss and updated params as unsharded execution."""
    batch = (make_photometry_batch(rng, B=16), make_spectra_batch(rng, B=16))
    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, **SMALL), SpectraVAE(**SMALL)]
    )
    params = init_model(model, batch, key, K=2)
    opt = adamw(1e-3)

    def loss_fn(m, variables, b, k):
        return objectives.m_iwae(m, variables, b, K=2, key=k, deterministic=True)

    step = make_train_step(model, opt, loss_fn)

    # the step donates its input state's buffers, so state_b needs its OWN
    # copies of the params (device_put of an already-placed array may alias)
    state_a = TrainState.create(params, opt, jax.random.PRNGKey(7))
    mesh = make_mesh()
    params_b = jax.tree_util.tree_map(jnp.array, params)
    state_b = replicate_state(
        TrainState.create(params_b, opt, jax.random.PRNGKey(7)), mesh
    )
    _, loss_single = step(state_a, batch)
    sharded = shard_batch(batch, mesh)
    new_state, loss_sharded = step(state_b, sharded)

    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=2e-4)
    assert int(new_state.step) == 1


def test_sharded_eval_reconstruction(rng, key):
    """Batched inference sharded over the mesh — the replacement for the
    400-job SLURM eval array (spect_cond_LC.sh)."""
    mesh = make_mesh()
    batch = make_spectra_batch(rng, B=16)
    model = SpectraVAE(**SMALL)
    variables = model.init({"params": key, "sample": key}, batch, 1)

    recon = jax.jit(
        lambda v, b: model.apply(v, b, 4, method="reconstruct",
                                 rngs={"sample": key})
    )(variables, shard_batch(batch, mesh))
    assert recon.shape == (4, 16, batch[0].shape[1])
    assert bool(jnp.all(jnp.isfinite(recon)))
