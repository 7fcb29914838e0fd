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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_tensor_parallel_specs_rules(rng, key):
    """Megatron-style spec assignment: q/k/v and ffn_0 column-sharded,
    out_proj/ffn_2 row-sharded, norms/embeddings replicated."""
    from jax.sharding import PartitionSpec as P

    from vaesne_tpu.parallel import MODEL_AXIS, tensor_parallel_specs

    batch = (make_photometry_batch(rng, B=8), make_spectra_batch(rng, B=8))
    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, **SMALL), SpectraVAE(**SMALL)]
    )
    params = init_model(model, batch, key, K=2)
    specs = tensor_parallel_specs(params)
    blk = specs["vaes_0"]["enc"]["blocks"]["block_0"]
    assert blk["self_attn"]["q_proj"]["kernel"] == P(None, MODEL_AXIS)
    assert blk["self_attn"]["q_proj"]["bias"] == P(MODEL_AXIS)
    assert blk["self_attn"]["out_proj"]["kernel"] == P(MODEL_AXIS, None)
    assert blk["self_attn"]["out_proj"]["bias"] == P()
    assert blk["ffn_0"]["kernel"] == P(None, MODEL_AXIS)
    assert blk["ffn_2"]["kernel"] == P(MODEL_AXIS, None)
    assert blk["layernorm1"]["scale"] == P()
    assert specs["vaes_0"]["enc"]["initbottleneck"] == P()


@pytest.mark.slow
def test_dp_tp_step_matches_single_device(rng, key):
    """The SAME jitted train step on a 4(data)x2(model) mesh with
    tensor-parallel parameter sharding must reproduce single-device
    training: per-head attention shards are exact; AdamW-with-clipping
    reduction order differs, so params agree to fp32 reduction noise."""
    from vaesne_tpu.parallel import shard_state_tp

    batch = (make_photometry_batch(rng, B=16), make_spectra_batch(rng, B=16))
    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, **SMALL), SpectraVAE(**SMALL)]
    )
    params = init_model(model, batch, key, K=2)
    # TP shardings require param-shaped optimizer moments
    opt = adamw(1e-3, flatten=False)

    def loss_fn(m, variables, b, k):
        return objectives.m_iwae(m, variables, b, K=2, key=k, deterministic=True)

    step = make_train_step(model, opt, loss_fn)

    state_a = TrainState.create(
        jax.tree_util.tree_map(jnp.array, params), opt, jax.random.PRNGKey(7)
    )
    state_a, loss_single = step(state_a, batch)

    mesh = make_mesh(data=4, model=2)
    state_b = shard_state_tp(
        TrainState.create(
            jax.tree_util.tree_map(jnp.array, params), opt, jax.random.PRNGKey(7)
        ),
        opt,
        mesh,
    )
    # placement honored: q_proj kernel split over the model axis
    qk = state_b.params["vaes_0"]["enc"]["blocks"]["block_0"]["self_attn"][
        "q_proj"]["kernel"]
    assert qk.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    # optimizer moments sharded congruently with their params
    mu_leaves = [
        leaf
        for leaf in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a: a.sharding.spec, state_b.opt_state)
        )
    ]
    assert jax.sharding.PartitionSpec(None, "model") in mu_leaves

    state_b, loss_tp = step(state_b, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(loss_single), float(loss_tp), rtol=2e-4)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state_a.params, state_b.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-3


@pytest.mark.slow
def test_scan_epoch_under_mesh_matches_single_device(rng, key):
    """The whole-epoch lax.scan program (make_scan_epoch) over mesh-sharded
    data + replicated state must reproduce the single-device epoch (same
    permutation, same per-step RNG chain) — extends the multi-device
    coverage from the per-step path to the scan path the drivers use."""
    from vaesne_tpu.training import make_scan_epoch

    data = (make_photometry_batch(rng, B=32), make_spectra_batch(rng, B=32))
    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, **SMALL), SpectraVAE(**SMALL)]
    )
    params = init_model(model, data, key, K=2)
    opt = adamw(1e-3)

    def loss_fn(m, variables, b, k):
        return objectives.m_iwae(m, variables, b, K=2, key=k, deterministic=True)

    epoch = make_scan_epoch(model, opt, loss_fn)
    state_a = TrainState.create(
        jax.tree_util.tree_map(jnp.array, params), opt, jax.random.PRNGKey(3)
    )
    state_a, loss_single = epoch(state_a, data, jax.random.PRNGKey(11),
                                 batch_size=8)

    mesh = make_mesh()
    state_b = replicate_state(
        TrainState.create(
            jax.tree_util.tree_map(jnp.array, params), opt, jax.random.PRNGKey(3)
        ),
        mesh,
    )
    state_b, loss_sharded = epoch(state_b, shard_batch(data, mesh),
                                  jax.random.PRNGKey(11), batch_size=8)

    np.testing.assert_allclose(loss_single, loss_sharded, rtol=2e-4)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state_a.params, state_b.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-3


@pytest.mark.slow
def test_scan_epoch_dp_tp_mesh(rng, key):
    """The scan-epoch program also runs under the dryrun's dp×tp (4×2) mesh
    with tensor-parallel parameter sharding and matches single-device."""
    from vaesne_tpu.parallel import shard_state_tp
    from vaesne_tpu.training import make_scan_epoch

    data = (make_photometry_batch(rng, B=16), make_spectra_batch(rng, B=16))
    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, **SMALL), SpectraVAE(**SMALL)]
    )
    params = init_model(model, data, key, K=2)
    opt = adamw(1e-3, flatten=False)  # TP needs param-shaped moments

    def loss_fn(m, variables, b, k):
        return objectives.m_iwae(m, variables, b, K=2, key=k, deterministic=True)

    epoch = make_scan_epoch(model, opt, loss_fn)
    state_a = TrainState.create(
        jax.tree_util.tree_map(jnp.array, params), opt, jax.random.PRNGKey(3)
    )
    state_a, loss_single = epoch(state_a, data, jax.random.PRNGKey(11),
                                 batch_size=8)

    mesh = make_mesh(data=4, model=2)
    state_b = shard_state_tp(
        TrainState.create(
            jax.tree_util.tree_map(jnp.array, params), opt, jax.random.PRNGKey(3)
        ),
        opt,
        mesh,
    )
    state_b, loss_tp = epoch(state_b, shard_batch(data, mesh),
                             jax.random.PRNGKey(11), batch_size=8)
    np.testing.assert_allclose(loss_single, loss_tp, rtol=2e-4)


class TestPallasPathSharding:
    """Round-3 closure of the round-2 gap: the PRODUCTION Pallas dispatch
    path (fused attention + masked-Laplace kernels, custom-partitioning
    wrapped — ops/partition.py) must itself partition over a dp mesh, not
    just the XLA fallback. Runs the real dispatch under interpret mode
    (VAESNE_PALLAS=1 + VAESNE_PALLAS_INTERPRET=1) on the virtual 8-device
    CPU mesh. Spectra length 256 crosses both kernel routing thresholds
    (attention: lq*lk >= 2^16; laplace: N >= 128)."""

    def _model_and_batch(self, rng, key, B=8):
        batch = (make_photometry_batch(rng, B=B),
                 make_spectra_batch(rng, B=B, N=256))
        model = PhotoSpecMMVAE(
            vaes=[PhotometricVAE(num_bands=6, **SMALL),
                  SpectraVAE(**{**SMALL, "dropout": 0.1})]
        )
        params = init_model(model, batch, key, K=1)
        return model, batch, params

    @pytest.mark.slow
    def test_sharded_pallas_loss_matches_single_device_xla(
            self, rng, key, monkeypatch):
        model, batch, params = self._model_and_batch(rng, key)

        def loss(p, b):
            return objectives.m_iwae(model, {"params": p}, b, K=1,
                                     key=jax.random.PRNGKey(5),
                                     deterministic=True)

        monkeypatch.setenv("VAESNE_PALLAS", "0")
        loss_xla = jax.jit(loss)(params, batch)

        monkeypatch.setenv("VAESNE_PALLAS", "1")
        monkeypatch.setenv("VAESNE_PALLAS_INTERPRET", "1")
        mesh = make_mesh()
        sharded = shard_batch(batch, mesh)
        jaxpr = str(jax.make_jaxpr(loss)(params, sharded))
        assert "pallas" in jaxpr or "custom_partitioning" in jaxpr, (
            "dispatch did not route to the Pallas kernel — the test would "
            "only re-cover the XLA fallback")
        loss_sharded = jax.jit(loss)(params, sharded)
        np.testing.assert_allclose(float(loss_xla), float(loss_sharded),
                                   rtol=2e-4)

    @pytest.mark.slow
    def test_dp_tp_pallas_loss_matches_single_device_xla(
            self, rng, key, monkeypatch):
        """Megatron TP (heads split over ``model``) THROUGH the production
        Pallas dispatch: the kernel's head-axis partitioning (round 3,
        ops/attention.py::_shard_axes) must reproduce the single-device XLA
        loss on a 4(data)x2(model) mesh."""
        from vaesne_tpu.parallel import shard_params_tp

        model, batch, params = self._model_and_batch(rng, key)

        def loss(p, b):
            return objectives.m_iwae(model, {"params": p}, b, K=1,
                                     key=jax.random.PRNGKey(5),
                                     deterministic=True)

        monkeypatch.setenv("VAESNE_PALLAS", "0")
        loss_xla = jax.jit(loss)(params, batch)

        monkeypatch.setenv("VAESNE_PALLAS", "1")
        monkeypatch.setenv("VAESNE_PALLAS_INTERPRET", "1")
        mesh = make_mesh(data=4, model=2)
        params_tp = shard_params_tp(
            jax.tree_util.tree_map(jnp.array, params), mesh, num_heads=2)
        loss_tp = jax.jit(loss)(params_tp, shard_batch(batch, mesh))
        np.testing.assert_allclose(float(loss_xla), float(loss_tp),
                                   rtol=2e-4)

    @pytest.mark.slow
    def test_sharded_pallas_train_step_no_allgather(
            self, rng, key, monkeypatch):
        """The compiled dp train step through the kernels must contain NO
        all-gather: each shard runs its batch rows locally (grad all-reduce
        is the only expected collective). Dropout active — the in-kernel
        PRNG path (per-shard seed decorrelation) is part of the program."""
        monkeypatch.setenv("VAESNE_PALLAS", "1")
        monkeypatch.setenv("VAESNE_PALLAS_INTERPRET", "1")
        model, batch, params = self._model_and_batch(rng, key)
        opt = adamw(1e-3)
        state = TrainState.create(params, opt, jax.random.PRNGKey(7))

        def loss_fn(m, variables, b, k):
            return objectives.m_iwae(m, variables, b, K=1, key=k,
                                     deterministic=False)

        step = make_train_step(model, opt, loss_fn)
        mesh = make_mesh()
        state = replicate_state(state, mesh)
        sharded = shard_batch(batch, mesh)
        compiled = jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__")
                           else step).lower(state, sharded).compile()
        hlo = compiled.as_text()
        assert "all-gather" not in hlo, (
            "dp mesh gathers the batch around the Pallas custom call — "
            "partitioning regressed")
        assert "all-reduce" in hlo  # the gradient reduction is still there
        new_state, loss = compiled(state, sharded)
        assert bool(jnp.isfinite(loss))
        assert int(new_state.step) == 1


class TestPallasHeadSharding:
    """Round-3 extension: the fused attention kernel partitions over the
    HEAD (packed E) axis too — the Megatron tensor-parallel layout from
    parallel/tp.py (q/k/v outputs head-sharded) — so tp meshes run the
    production kernel locally per whole-head shard instead of gathering
    (ops/attention.py::_shard_axes). Interpret mode on the virtual CPU
    mesh, as in TestPallasPathSharding."""

    H = 4

    def _qkvb(self, rng, B=8, dh=4, Lq=256, Lk=256):
        E = self.H * dh
        q = jnp.asarray(rng.normal(size=(B, E, Lq)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, E, Lk)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, E, Lk)), jnp.float32)
        bias = jnp.where(
            jnp.asarray(rng.uniform(size=(B, Lk))) < 0.2, -1e9, 0.0
        ).astype(jnp.float32)
        return q, k, v, bias

    def _shard(self, args, mesh, spec_e):
        from jax.sharding import NamedSharding, PartitionSpec as P

        q, k, v, bias = args
        qkv = NamedSharding(mesh, P("data", spec_e, None))
        bsh = NamedSharding(mesh, P("data", None))  # bias is [B, Lk]
        return (jax.device_put(q, qkv), jax.device_put(k, qkv),
                jax.device_put(v, qkv), jax.device_put(bias, bsh))

    @pytest.mark.slow
    def test_head_sharded_matches_unsharded(self, rng):
        """dp×tp (2×4) sharding of [B, E, L] operands — whole-head E split
        (4 heads / 4 shards) — must reproduce the unsharded kernel exactly
        and compile without any all-gather."""
        from vaesne_tpu.ops.attention import fused_attention

        args = self._qkvb(rng)

        def f(q, k, v, bias):
            return fused_attention(q, k, v, bias, self.H, 0.0, True)

        expected = f(*args)
        mesh = make_mesh(data=2, model=4)
        sharded = self._shard(args, mesh, "model")
        compiled = jax.jit(f).lower(*sharded).compile()
        assert "all-gather" not in compiled.as_text(), (
            "tp mesh gathers heads around the Pallas kernel — head-axis "
            "partitioning regressed (ops/attention.py::_shard_axes)")
        out = compiled(*sharded)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_head_sharded_backward_matches_unsharded(self, rng):
        from vaesne_tpu.ops.attention import fused_attention

        args = self._qkvb(rng)

        def loss(q, k, v, bias):
            return jnp.sum(
                fused_attention(q, k, v, bias, self.H, 0.0, True) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2))(*args)
        mesh = make_mesh(data=2, model=4)
        sharded = self._shard(args, mesh, "model")
        grads_tp = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*sharded)
        for g, gt in zip(grads, grads_tp):
            np.testing.assert_allclose(np.asarray(gt), np.asarray(g),
                                       rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_midhead_split_falls_back_to_replication(self, rng):
        """8-way E sharding of 4 heads would split mid-head; the partition
        callback must replicate E (correct, just gathered) instead."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vaesne_tpu.ops.attention import fused_attention

        args = self._qkvb(rng, B=8)

        def f(q, k, v, bias):
            return fused_attention(q, k, v, bias, self.H, 0.0, True)

        expected = f(*args)
        mesh = make_mesh(data=1, model=8)
        qkv = NamedSharding(mesh, P(None, "model", None))
        sharded = tuple(jax.device_put(a, qkv) for a in args[:3]) + (
            jax.device_put(args[3], NamedSharding(mesh, P(None, None))),)
        out = jax.jit(f)(*sharded)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_head_sharded_dropout_runs_decorrelated(self, rng):
        """With dropout active, head shards draw DISJOINT mask streams.

        Construction: all H heads carry identical q/k/v content, so without
        dropout every head's output block is identical. Under head sharding
        (model=4 -> one head per shard) each shard's kernel sees local head
        index 0 — if the shard seed offset (_seed_lower_fn) were missing,
        every shard would regenerate the SAME mask stream and the identical
        inputs would produce identical head blocks. The offset makes each
        shard's stream disjoint, so every pair of head blocks must differ."""
        from vaesne_tpu.ops.attention import fused_attention

        q, k, v, bias = self._qkvb(rng, dh=4)
        # tile head 0's block across all H heads (packed E = H*dh, dim 1)
        tile = lambda a: jnp.tile(a[:, :4, :], (1, self.H, 1))
        args = (tile(q), tile(k), tile(v), bias)
        seed = jnp.int32(123)

        def f(q, k, v, bias):
            return fused_attention(q, k, v, bias, self.H, 0.5, True, seed)

        mesh = make_mesh(data=2, model=4)
        sharded = self._shard(args, mesh, "model")
        compiled = jax.jit(f).lower(*sharded).compile()
        assert "all-gather" not in compiled.as_text()
        out = np.asarray(compiled(*sharded))
        assert np.all(np.isfinite(out))

        def f0(q, k, v, bias):
            return fused_attention(q, k, v, bias, self.H, 0.0, True)

        out0 = np.asarray(jax.jit(f0)(*sharded))
        assert not np.allclose(out, out0), "dropout had no effect"
        # identical inputs per head: without dropout the blocks coincide ...
        blocks0 = [out0[:, 4 * h: 4 * (h + 1), :] for h in range(self.H)]
        for hb in blocks0[1:]:
            np.testing.assert_allclose(hb, blocks0[0], rtol=1e-5, atol=1e-6)
        # ... with dropout every pair must differ (disjoint mask streams
        # across shards; correlated streams would reproduce head 0's block)
        blocks = [out[:, 4 * h: 4 * (h + 1), :] for h in range(self.H)]
        for i in range(self.H):
            for j in range(i + 1, self.H):
                assert not np.allclose(blocks[i], blocks[j]), (
                    f"head shards {i} and {j} drew correlated dropout masks")


def test_tp_divisibility_check(rng, key):
    """embed 16 over a 2-way model axis is fine; a 3-way axis must raise."""
    from vaesne_tpu.parallel import shard_params_tp

    batch = (make_photometry_batch(rng, B=8), make_spectra_batch(rng, B=8))
    model = PhotoSpecMMVAE(
        vaes=[PhotometricVAE(num_bands=6, **SMALL), SpectraVAE(**SMALL)]
    )
    params = init_model(model, batch, key, K=2)
    mesh = make_mesh(devices=jax.devices()[:6], data=2, model=3)
    with pytest.raises(ValueError, match="not divisible"):
        shard_params_tp(params, mesh)
    # tensor dims divisible but heads would split mid-head: SMALL uses
    # num_heads=2, embed 16 — 16 % 4 == 0 passes the shape check, so only
    # the explicit num_heads contract can catch 2 % 4 != 0
    mesh4 = make_mesh(devices=jax.devices()[:8], data=2, model=4)
    with pytest.raises(ValueError, match="num_heads"):
        shard_params_tp(params, mesh4, num_heads=2)
