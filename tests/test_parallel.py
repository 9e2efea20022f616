"""Data-parallel correctness on a virtual 8-device CPU mesh.

The reference had no distributed tests (SURVEY.md §4); here DP is validated
by construction: the same global batch must produce identical losses and
updated parameters whether the mesh has 1 device or 8 (the global-batch
loss semantics of reference trainer_sr.py:57-68).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from srf_tpu.models.srf import SequenceRouter
from srf_tpu.parallel.mesh import make_mesh, shard_batch
from srf_tpu.train.optimizer import noam_schedule
from srf_tpu.train.state import TrainState
from srf_tpu.train.step import make_apply_fn, make_train_step, make_valid_step


def _tiny_setup():
    model = SequenceRouter(
        feat_dim=12, class_n=7, enc_num=2, caps_primary_num=4,
        caps_primary_dim=3, caps_conv_num=4, caps_conv_dim=3, caps_class_dim=3,
        caps_iter=1, lpad=1, rpad=0, is_context=True, conv_layer_num=2,
        conv_filter_num=4, caps_type="naive", inp_dropout=0.0, inn_dropout=0.0,
    )
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    batch = {
        "feats": jnp.asarray(host.randn(8, 24, 12), jnp.float32),
        "labels": jnp.asarray(host.randint(1, 6, size=(8, 3)), jnp.int32),
        "inp_len": jnp.asarray([24, 20, 17, 24, 22, 24, 19, 24], jnp.int32),
        "tar_len": jnp.asarray([3, 2, 3, 3, 2, 3, 2, 3], jnp.int32),
    }
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["feats"][:1],
        batch["inp_len"][:1], False,
    )
    tx = optax.adam(noam_schedule(1.0, 8, 100))
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats", {}))
    return model, tx, state, batch, rng


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp8_matches_single_device():
    model, tx, state0, batch, rng = _tiny_setup()
    apply_fn = make_apply_fn(model)

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(num_data=n_dev, devices=jax.devices()[:n_dev])
        step = make_train_step(apply_fn, tx, 4, mesh=mesh, donate=False)
        state = jax.device_put(
            state0, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
        sharded = shard_batch(mesh, batch)
        for _ in range(3):
            state, metrics = step(state, sharded, rng)
        results[n_dev] = (
            float(metrics["loss_sum"]),
            jax.device_get(jax.tree.leaves(state.params)[0]),
        )
    loss1, leaf1 = results[1]
    loss8, leaf8 = results[8]
    assert np.isfinite(loss1)
    np.testing.assert_allclose(loss8, loss1, rtol=1e-4)
    np.testing.assert_allclose(leaf8, leaf1, rtol=1e-3, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_valid_step_on_mesh():
    model, tx, state, batch, rng = _tiny_setup()
    mesh = make_mesh(num_data=8)
    valid = make_valid_step(make_apply_fn(model), 4, mesh=mesh)
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    metrics = valid(state, shard_batch(mesh, batch))
    assert np.isfinite(float(metrics["loss_sum"]))
    assert float(metrics["samples"]) == 8.0


def test_graft_dryrun_multichip_driver_env():
    """Round-1 regression: the driver runs dryrun_multichip in a fresh
    process WITHOUT the conftest platform override, where the default
    backend can be the remote TPU (which died on a libtpu skew,
    MULTICHIP_r01.json). The dryrun must pin itself to the virtual CPU
    devices and never touch the default backend."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let sitecustomize pick the default
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        .replace("--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fsdp_matches_replicated():
    """ZeRO-style sharding of params+opt state over 'data' must be a pure
    layout change: identical losses/params to replicated DP."""
    from srf_tpu.parallel.sharding_rules import fsdp_sharding

    model, tx, state0, batch, rng = _tiny_setup()
    apply_fn = make_apply_fn(model)
    mesh = make_mesh(num_data=8)
    sharded_batch = shard_batch(mesh, batch)

    # replicated reference
    step_repl = make_train_step(apply_fn, tx, 4, mesh=mesh, donate=False)
    state_r = jax.device_put(
        state0, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    for _ in range(3):
        state_r, metrics_r = step_repl(state_r, sharded_batch, rng)

    # FSDP (min_size=0 so even the tiny test params shard)
    sharding = fsdp_sharding(state0, mesh, min_size=0)
    state_f = jax.device_put(state0, sharding)
    step_fsdp = make_train_step(
        apply_fn, tx, 4, mesh=mesh, donate=False, state_sharding=sharding
    )
    for _ in range(3):
        state_f, metrics_f = step_fsdp(state_f, sharded_batch, rng)

    # at least one parameter leaf must actually be sharded over 'data'
    assert any(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree.leaves(state_f.params)
    )
    np.testing.assert_allclose(
        float(metrics_f["loss_sum"]), float(metrics_r["loss_sum"]), rtol=1e-4
    )
    leaves_r = jax.tree.leaves(state_r.params)
    leaves_f = jax.tree.leaves(state_f.params)
    for a, b in zip(leaves_r, leaves_f):
        np.testing.assert_allclose(
            jax.device_get(a), jax.device_get(b), rtol=1e-3, atol=1e-6
        )
