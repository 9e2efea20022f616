"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-device mesh.

The reference has no pipeline story (its only distribution mode is mirrored
data parallelism, reference: tfsr/trainer_sr.py:139-149); the GPipe schedule
here is validated by construction: pipelined forward/gradients must equal
the plain sequential block loop, for any stage count that divides the
blocks, with and without a composed 'data' axis, with and without remat.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srf_tpu.models.stf import ConvEncoder
from srf_tpu.ops.masking import get_padding_bias
from srf_tpu.parallel.pipeline import (
    make_pipeline_apply_fn,
    make_stf_block_fn,
    pipeline_blocks,
    stack_block_params,
    unstack_block_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _setup(num_layers=4, batch=8, dropout=0.1):
    model = ConvEncoder(
        num_layers=num_layers, d_model=16, num_heads=2, dff=32,
        feat_dim=20, vocab_n=11, attention_impl="plain",
        input_dropout=dropout, inner_dropout=dropout,
        residual_dropout=dropout, attention_dropout=dropout,
    )
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    feats = jnp.asarray(host.randn(batch, 32, 20), jnp.float32)
    lens = jnp.asarray(
        host.randint(16, 33, size=(batch,)), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng}, feats, lens, True)
    return model, variables, feats, lens, rng


def _reference_logits(model, variables, feats, lens):
    mask = get_padding_bias(lens, 8, 4)
    return model.apply(variables, feats, lens, False, mask=mask,
                       in_len_div=4)


def test_stack_unstack_roundtrip():
    model, variables, *_ = _setup()
    stacked = stack_block_params(variables["params"], model.num_layers)
    back = unstack_block_params(stacked, model.num_layers)
    for i in range(model.num_layers):
        a = jax.tree.leaves(variables["params"]["enc%d" % i])
        b = jax.tree.leaves(back["enc%d" % i])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("stages,microbatches", [(2, 4), (4, 4), (4, 1),
                                                 (4, 8)])
def test_pipeline_forward_matches_sequential(stages, microbatches):
    model, variables, feats, lens, rng = _setup()
    ref = _reference_logits(model, variables, feats, lens)
    mesh = Mesh(np.asarray(jax.devices()[:stages]), ("pipe",))
    apply_fn = make_pipeline_apply_fn(
        model, mesh, microbatches, in_len_div=4)
    out, _ = jax.jit(apply_fn, static_argnums=(3,))(
        variables["params"], variables.get("batch_stats", {}),
        {"feats": feats, "inp_len": lens}, False, rng)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pipeline_gradients_match_sequential():
    model, variables, feats, lens, rng = _setup()
    mask = get_padding_bias(lens, 8, 4)
    stats = variables.get("batch_stats", {})
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    apply_fn = make_pipeline_apply_fn(model, mesh, 4, in_len_div=4)

    def loss_seq(p):
        o = model.apply({"params": p, "batch_stats": stats}, feats, lens,
                        False, mask=mask, in_len_div=4)
        return jnp.mean(o * o)

    def loss_pipe(p):
        o, _ = apply_fn(p, stats, {"feats": feats, "inp_len": lens},
                        False, rng)
        return jnp.mean(o * o)

    g_seq = jax.grad(loss_seq)(variables["params"])
    g_pipe = jax.jit(jax.grad(loss_pipe))(variables["params"])
    flat_seq = jax.tree.leaves(g_seq)
    flat_pipe = jax.tree.leaves(g_pipe)
    for a, b in zip(flat_seq, flat_pipe):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)


def test_pipeline_composes_with_data_axis():
    model, variables, feats, lens, rng = _setup()
    ref = _reference_logits(model, variables, feats, lens)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "pipe"))
    apply_fn = make_pipeline_apply_fn(model, mesh, 2, in_len_div=4)
    out, _ = jax.jit(apply_fn, static_argnums=(3,))(
        variables["params"], variables.get("batch_stats", {}),
        {"feats": feats, "inp_len": lens}, False, rng)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pipeline_remat_matches_no_remat():
    model, variables, feats, lens, rng = _setup()
    stats = variables.get("batch_stats", {})
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
    outs = {}
    for remat in (False, True):
        apply_fn = make_pipeline_apply_fn(
            model, mesh, 4, in_len_div=4, remat=remat)

        def loss(p, apply_fn=apply_fn):
            o, _ = apply_fn(p, stats, {"feats": feats, "inp_len": lens},
                            False, rng)
            return jnp.mean(o * o)

        outs[remat] = jax.jit(jax.grad(loss))(variables["params"])
    for a, b in zip(jax.tree.leaves(outs[False]),
                    jax.tree.leaves(outs[True])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_pipeline_training_mode_runs_and_learns_shape():
    """Training mode: dropout rngs fold per (block, microbatch), BN stats
    update in the (replicated) front-end, gradients are finite."""
    model, variables, feats, lens, rng = _setup()
    stats = variables.get("batch_stats", {})
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "pipe"))
    apply_fn = make_pipeline_apply_fn(model, mesh, 2, in_len_div=4)
    def fwd(p):
        return apply_fn(p, stats, {"feats": feats, "inp_len": lens},
                        True, rng)

    out, new_stats = jax.jit(fwd)(variables["params"])
    grads = jax.jit(
        jax.grad(lambda q: jnp.mean(fwd(q)[0] ** 2))
    )(variables["params"])
    assert bool(jnp.isfinite(out).all())
    assert jax.tree.leaves(new_stats), "BN stats did not update"
    assert all(bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads))


def test_pipeline_full_train_step_matches_dp():
    """One optimizer step through make_train_step: the dp x pp pipelined
    apply must produce the same loss/params as plain single-mesh DP."""
    from srf_tpu.parallel.mesh import make_mesh, shard_batch
    from srf_tpu.train.optimizer import noam_schedule
    from srf_tpu.train.state import TrainState
    from srf_tpu.train.step import make_apply_fn, make_train_step
    from srf_tpu.trainer_tf import make_stf_extra_kwargs

    # zero dropout: the sequential flax path derives per-layer rngs from
    # module scopes while the pipeline folds per (block, microbatch) —
    # different masks by construction, so parity needs dropout off (the
    # ConvFrontEnd's internal rate-0.2 dropout is scope-derived in BOTH
    # paths, since the front-end runs through the same model.apply)
    model, variables, feats, lens, rng = _setup(dropout=0.0)
    host = np.random.RandomState(1)
    batch = {
        "feats": feats,
        "inp_len": lens,
        "labels": jnp.asarray(host.randint(1, 10, size=(8, 3)), jnp.int32),
        "tar_len": jnp.asarray([3, 2, 3, 3, 2, 3, 2, 3], jnp.int32),
    }
    tx = optax.adam(noam_schedule(1.0, 8, 100))

    # baseline: plain DP on a 1-device mesh
    mesh1 = make_mesh(num_data=1, devices=jax.devices()[:1])
    apply1 = make_apply_fn(model, make_stf_extra_kwargs(None, 4))
    step1 = make_train_step(apply1, tx, 4, mesh=mesh1, donate=False)
    state1 = TrainState.create(variables["params"], tx,
                               variables.get("batch_stats", {}))
    state1, m1 = step1(state1, shard_batch(mesh1, batch), rng)

    # pipelined: (data=2, pipe=4)
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "pipe"))
    apply2 = make_pipeline_apply_fn(model, mesh, 2, in_len_div=4)
    step2 = make_train_step(apply2, tx, 4, mesh=mesh, donate=False)
    state2 = TrainState.create(variables["params"], tx,
                               variables.get("batch_stats", {}))
    state2 = jax.device_put(state2, NamedSharding(mesh, P()))
    state2, m2 = step2(state2, shard_batch(mesh, batch), rng)

    np.testing.assert_allclose(float(m2["loss_sum"]), float(m1["loss_sum"]),
                               rtol=2e-4)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-5)


def test_pipeline_indivisible_microbatch_rounds_down():
    """batch 6 with requested 4 microbatches -> effective 3 (trace-time),
    still exact."""
    model, variables, feats, lens, rng = _setup(batch=6)
    ref = _reference_logits(model, variables, feats, lens)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pipe",))
    apply_fn = make_pipeline_apply_fn(model, mesh, 4, in_len_div=4)
    out, _ = jax.jit(apply_fn, static_argnums=(3,))(
        variables["params"], variables.get("batch_stats", {}),
        {"feats": feats, "inp_len": lens}, False, rng)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
