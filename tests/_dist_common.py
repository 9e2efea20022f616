"""Shared setup for the 2-process distributed worker scripts.

Importing this module pins the worker to local CPU devices BEFORE any
backend initialization (a sitecustomize may import jax early and snapshot
JAX_PLATFORMS, so the env var alone is not enough — same workaround as
tests/conftest.py), which is why the env mutation happens at import time:
the worker scripts import this as their FIRST repo import.

``worker_setup(pattern)`` then connects jax.distributed over the
localhost coordinator (SRF_* env from the launching test), loads THIS
process's shard of the shared TFRecord corpus through the real loader
sharding (data/loader.py:47-50), builds the tiny SRF model, replicates a
fresh TrainState over the global 2x2-device 'data' mesh, and assembles
the global batch with parallel.mesh.put_sharded.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

FEAT = 10
VOCAB = 6


def worker_setup(pattern):
    """Returns (state, batch, mesh, repl_sharding, model, tx, apply args)."""
    from srf_tpu.data.loader import EvalLoader, SpeechDataset
    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.parallel.distributed import maybe_initialize
    from srf_tpu.parallel.mesh import (
        batch_sharding, make_mesh, put_sharded, replicated,
    )
    from srf_tpu.train.state import TrainState

    assert maybe_initialize(), "SRF_COORDINATOR env missing"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4  # 2 processes x 2 local CPU devices

    ds = SpeechDataset(
        pattern, FEAT, process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    assert len(ds) == 2  # 4 utterances round-robined over 2 processes
    local = next(iter(EvalLoader(ds, batch_size=2, pad_multiple=32)))

    model = SequenceRouter(
        feat_dim=FEAT, class_n=VOCAB + 1, enc_num=2, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4,
        caps_class_dim=4, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=8, caps_type="naive",
    )
    rng = jax.random.PRNGKey(11)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 32, FEAT)), jnp.array([32]), False,
    )
    tx = optax.adam(1e-3)
    state = TrainState.create(
        variables["params"], tx, variables.get("batch_stats", {})
    )

    mesh = make_mesh()  # 4 global devices on the data axis
    assert mesh.shape["data"] == 4
    repl = replicated(mesh)
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        state,
    )
    batch = put_sharded(
        {k: local[k] for k in ("feats", "labels", "inp_len", "tar_len")},
        batch_sharding(mesh),
    )
    assert batch["feats"].shape[0] == 4  # global batch across processes
    return state, batch, mesh, repl, model, tx, rng


def print_fingerprint(new_state, metrics, repl):
    """Emit the {loss_sum, param_fp} JSON line the parent compares."""
    import json

    param_fp = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p)),
        out_shardings=repl,
    )(new_state.params)
    print(json.dumps({
        "process": jax.process_index(),
        "loss_sum": float(jax.device_get(metrics["loss_sum"])),
        "param_fp": float(jax.device_get(param_fp)),
    }), flush=True)
