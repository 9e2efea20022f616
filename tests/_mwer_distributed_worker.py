"""Worker process for the 2-process distributed MWER test.

Same harness as tests/_distributed_worker.py (localhost CPU
jax.distributed, real loader sharding, global batch assembly over a
2 processes x 2 devices 'data' mesh) but the step is MWER fine-tuning
(train/mwer.py): each process host-decodes the n-best ONLY for its own
logit shards, the hypothesis/error arrays reassemble onto the mesh, and
the jitted expected-word-error update runs SPMD. Prints a JSON
fingerprint {loss_sum, param_fp} the parent compares against a
single-process oracle.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# a sitecustomize may import jax before this script runs, snapshotting
# JAX_PLATFORMS too early; config.update is the effective override (same
# workaround as tests/conftest.py). Must happen BEFORE jax.distributed
# connects / any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from srf_tpu.parallel.distributed import maybe_initialize  # noqa: E402

assert maybe_initialize(), "SRF_COORDINATOR env missing"
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from srf_tpu.data.loader import EvalLoader, SpeechDataset  # noqa: E402
from srf_tpu.models.srf import SequenceRouter  # noqa: E402
from srf_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding, make_mesh, put_sharded, replicated,
)
from srf_tpu.train.mwer import make_mwer_train_step  # noqa: E402
from srf_tpu.train.state import TrainState  # noqa: E402
from srf_tpu.train.step import make_apply_fn, make_logits_fn  # noqa: E402

FEAT = 10
VOCAB = 6


def main():
    pattern = sys.argv[1]
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

    apply_fn = make_apply_fn(model)
    train_step = make_mwer_train_step(
        apply_fn, make_logits_fn(apply_fn), tx, in_len_div=4,
        beam_width=4, n_best=2, blank_id=VOCAB, lam_ctc=0.1, mesh=mesh,
    )
    new_state, metrics = train_step(state, batch, rng)
    param_fp = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p)),
        out_shardings=repl,
    )(new_state.params)
    print(json.dumps({
        "process": jax.process_index(),
        "loss_sum": float(jax.device_get(metrics["loss_sum"])),
        "param_fp": float(jax.device_get(param_fp)),
    }), flush=True)


if __name__ == "__main__":
    main()
