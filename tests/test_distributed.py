"""Multi-host bootstrap gating + a REAL 2-process distributed run.

The gating tests mock jax.distributed; test_two_process_dp_matches_single
spawns two actual OS processes with a localhost coordinator and checks the
distributed data-parallel train step (real loader sharding, global batch
assembly, psum over the 2x2-device mesh) against a single-process run on
the identical examples (VERDICT r2 item 4)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import srf_tpu.parallel.distributed as dist


def test_no_env_is_noop(monkeypatch):
    monkeypatch.delenv("SRF_COORDINATOR", raising=False)
    monkeypatch.delenv("SRF_MULTIHOST", raising=False)
    assert dist.maybe_initialize() is False


def test_coordinator_env_calls_initialize(monkeypatch):
    calls = {}

    class FakeDistributed:
        @staticmethod
        def initialize(**kw):
            calls.update(kw)

    import jax

    monkeypatch.setattr(jax, "distributed", FakeDistributed)
    monkeypatch.setenv("SRF_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("SRF_NUM_PROCESSES", "4")
    monkeypatch.setenv("SRF_PROCESS_ID", "2")
    assert dist.maybe_initialize() is True
    assert calls == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }


def test_multihost_flag_calls_autodetect(monkeypatch):
    called = []

    class FakeDistributed:
        @staticmethod
        def initialize(**kw):
            called.append(kw)

    import jax

    monkeypatch.delenv("SRF_COORDINATOR", raising=False)
    monkeypatch.setenv("SRF_MULTIHOST", "1")
    monkeypatch.setattr(jax, "distributed", FakeDistributed)
    assert dist.maybe_initialize() is True
    assert called == [{}]


def _write_corpus(path, n_utt=4, feat_dim=10):
    from srf_tpu.data.example_proto import encode_example
    from srf_tpu.data.tfrecord import TFRecordWriter

    rng = np.random.RandomState(41)
    with TFRecordWriter(str(path)) as w:
        for i in range(n_utt):
            t = 20 + 3 * i
            feats = rng.randn(t, feat_dim).astype(np.float32)
            labels = rng.randint(1, 6, size=4 + i % 2).astype(np.int64)
            w.write(encode_example({
                "input_speech": feats.reshape(-1),
                "target_label": labels,
                "input_length": np.array([t], np.int64),
                "target_length": np.array([labels.size], np.int64),
                "utt_id": [b"utt%02d" % i],
            }))


def _launch_two_process(worker_basename, record, extra_args=(), expect_rc=0):
    """Run a 2-process jax.distributed worker over a localhost
    coordinator; return both processes' parsed JSON fingerprints
    (``expect_rc != 0``: assert the exit code and return raw outputs)."""
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    worker = os.path.join(os.path.dirname(__file__), worker_basename)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            SRF_COORDINATOR="127.0.0.1:%d" % port,
            SRF_NUM_PROCESSES="2",
            SRF_PROCESS_ID=str(pid),
        )
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(record)] + list(extra_args),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == expect_rc, (p.returncode, err[-3000:])
        if expect_rc != 0:
            results.append(out + "\n" + err)
            continue
        # the collectives backend may interleave its own stdout lines
        # (e.g. "[Gloo] Rank ...") around the worker's JSON line
        json_lines = [
            ln for ln in out.strip().splitlines() if ln.startswith("{")
        ]
        assert json_lines, "no JSON line in worker output:\n%s" % out[-1000:]
        results.append(json.loads(json_lines[-1]))
    return results


def test_two_process_dp_matches_single(tmp_path):
    """Two real processes (jax.distributed over localhost CPU, 2 local
    devices each) must produce the same summed loss and post-update param
    fingerprint as one process training on the same 4 utterances."""
    import jax
    import jax.numpy as jnp
    import optax

    from srf_tpu.data.loader import EvalLoader, SpeechDataset
    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.parallel.mesh import make_mesh, shard_batch
    from srf_tpu.train.state import TrainState
    from srf_tpu.train.step import make_apply_fn, make_train_step

    record = tmp_path / "dist-corpus.tfrecord"
    _write_corpus(record)
    results = _launch_two_process("_distributed_worker.py", record)

    # both processes observe the same global loss / updated params
    assert abs(results[0]["loss_sum"] - results[1]["loss_sum"]) < 1e-4
    assert abs(results[0]["param_fp"] - results[1]["param_fp"]) < 1e-4

    # single-process oracle on the identical example set, reordered to the
    # multi-process global interleave (process 0 owns rows 0-1 = examples
    # 0,2; process 1 owns rows 2-3 = examples 1,3) so positional dropout
    # masks line up exactly
    ds = SpeechDataset(str(record), 10)
    assert len(ds) == 4
    local = next(iter(EvalLoader(ds, batch_size=4, pad_multiple=32)))
    perm = np.array([0, 2, 1, 3])
    local = {
        k: (v[perm] if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0
            else v)
        for k, v in local.items()
    }
    model = SequenceRouter(
        feat_dim=10, class_n=7, enc_num=2, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4,
        caps_class_dim=4, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=8, caps_type="naive",
    )
    rng = jax.random.PRNGKey(11)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 32, 10)), jnp.array([32]), False,
    )
    tx = optax.adam(1e-3)
    state = TrainState.create(
        variables["params"], tx, variables.get("batch_stats", {})
    )
    mesh = make_mesh(num_data=4, devices=jax.devices()[:4])
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    batch = shard_batch(
        mesh, {k: local[k] for k in ("feats", "labels", "inp_len", "tar_len")}
    )
    train_step = make_train_step(make_apply_fn(model), tx, 4, mesh=mesh,
                                 donate=False)
    new_state, metrics = train_step(state, batch, rng)
    want_loss = float(jax.device_get(metrics["loss_sum"]))
    want_fp = float(jax.device_get(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(new_state.params))
    ))
    got = results[0]
    assert got["loss_sum"] == pytest.approx(want_loss, rel=1e-4)
    assert got["param_fp"] == pytest.approx(want_fp, rel=1e-5)


def test_two_process_mwer_matches_single(tmp_path):
    """MWER fine-tuning across 2 real processes: each host n-best-decodes
    only its own logit shards (train/mwer.py _process_local_rows), the
    hypothesis/error arrays reassemble onto the 'data' mesh axis, and the
    SPMD expected-word-error update matches a single-process oracle on the
    identical examples."""
    import jax
    import jax.numpy as jnp
    import optax

    from srf_tpu.data.loader import EvalLoader, SpeechDataset
    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.parallel.mesh import make_mesh, shard_batch
    from srf_tpu.train.mwer import make_mwer_train_step
    from srf_tpu.train.state import TrainState
    from srf_tpu.train.step import make_apply_fn, make_logits_fn

    record = tmp_path / "mwer-dist-corpus.tfrecord"
    _write_corpus(record)
    results = _launch_two_process("_mwer_distributed_worker.py", record)

    # both processes observe the same global loss / updated params
    assert abs(results[0]["loss_sum"] - results[1]["loss_sum"]) < 1e-4
    assert abs(results[0]["param_fp"] - results[1]["param_fp"]) < 1e-4

    # single-process oracle, rows permuted to the multi-process global
    # interleave (same convention as test_two_process_dp_matches_single)
    ds = SpeechDataset(str(record), 10)
    local = next(iter(EvalLoader(ds, batch_size=4, pad_multiple=32)))
    perm = np.array([0, 2, 1, 3])
    local = {
        k: (v[perm] if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0
            else v)
        for k, v in local.items()
    }
    model = SequenceRouter(
        feat_dim=10, class_n=7, enc_num=2, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4,
        caps_class_dim=4, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=8, caps_type="naive",
    )
    rng = jax.random.PRNGKey(11)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 32, 10)), jnp.array([32]), False,
    )
    tx = optax.adam(1e-3)
    state = TrainState.create(
        variables["params"], tx, variables.get("batch_stats", {})
    )
    mesh = make_mesh(num_data=4, devices=jax.devices()[:4])
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    batch = shard_batch(
        mesh, {k: local[k] for k in ("feats", "labels", "inp_len", "tar_len")}
    )
    apply_fn = make_apply_fn(model)
    train_step = make_mwer_train_step(
        apply_fn, make_logits_fn(apply_fn), tx, in_len_div=4,
        beam_width=4, n_best=2, blank_id=6, lam_ctc=0.1, mesh=mesh,
    )
    new_state, metrics = train_step(state, batch, rng)
    want_loss = float(jax.device_get(metrics["loss_sum"]))
    want_fp = float(jax.device_get(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(new_state.params))
    ))
    got = results[0]
    assert got["loss_sum"] == pytest.approx(want_loss, rel=1e-4)
    assert got["param_fp"] == pytest.approx(want_fp, rel=1e-5)


def test_two_process_loader_lockstep(tmp_path):
    """BucketedLoader(global_sync=True) on an UNEVEN corpus (5 utterances
    round-robined 3/2): both processes must emit identical static shapes
    and the SAME batch count (the global min), or multi-process SPMD
    deadlocks / assembles mismatched global arrays."""
    record = tmp_path / "sync-corpus.tfrecord"
    _write_corpus(record, n_utt=5)
    results = _launch_two_process("_loader_sync_worker.py", record)

    by_proc = {r["process"]: r for r in results}
    assert by_proc[0]["local_examples"] == 3  # round-robin 5 over 2
    assert by_proc[1]["local_examples"] == 2
    # lockstep: same count (min local = 2 with batch 1) and same shapes
    assert len(by_proc[0]["shapes"]) == 2
    assert by_proc[0]["shapes"] == by_proc[1]["shapes"]
    # bucketed lockstep (plan_lockstep_epoch): lengths 20,23,26,29,32 with
    # boundary 24 -> p0 owns (20,26,32) = buckets {0,1,1}, p1 owns (23,29)
    # = buckets {0,1}; min ready per bucket = 1 each -> 2 global batches,
    # identical shape sequences, disjoint utterances across processes
    b0, b1 = by_proc[0], by_proc[1]
    assert len(b0["bucketed_shapes"]) == 2
    assert b0["bucketed_shapes"] == b1["bucketed_shapes"]
    ids0 = {u for batch in b0["bucketed_ids"] for u in batch}
    ids1 = {u for batch in b1["bucketed_ids"] for u in batch}
    assert ids0 and ids1 and not (ids0 & ids1)


def test_two_process_bucketed_cli_train(tmp_path):
    """The full trainer_sr CLI with --train-batch-dynamic=True across 2
    real processes: build_loaders splits the global bucket batch sizes,
    the loaders run the globally agreed schedule (plan_lockstep_epoch),
    and both processes finish 2 epochs with identical checkpoints."""
    from srf_tpu.data.example_proto import encode_example
    from srf_tpu.data.tfrecord import TFRecordWriter

    base = tmp_path / "bucketed"
    base.mkdir()
    (base / "test.vocab").write_text(
        "\n".join(["<PADDING_SYMBOL>", "a", "b", "c", "<SPACE>", "$", "@"])
        + "\n"
    )
    rng = np.random.RandomState(5)

    def write_split(name, n_utt):
        # short (<=20 frames, bucket 0) / long (>20, bucket 1) in PAIRS
        # (ss ll ss ll ...): round-robin over 2 processes sends one of
        # each pair to each process, so both get the same short/long mix
        # (a strict alternation would give p0 all shorts and p1 all
        # longs — every bucket would starve globally)
        with TFRecordWriter(str(base / name)) as w:
            for i in range(n_utt):
                t = int(rng.randint(14, 18) if (i // 2) % 2 == 0
                        else rng.randint(25, 31))
                feats = rng.randn(t, 10).astype(np.float32)
                labels = rng.randint(1, 4, size=int(rng.randint(3, 6)))
                w.write(encode_example({
                    "input_speech": feats.reshape(-1),
                    "target_label": labels.astype(np.int64),
                    "input_length": np.array([t], np.int64),
                    "target_length": np.array([labels.size], np.int64),
                    "utt_id": [b"%s%02d" % (name.encode(), i)],
                }))

    write_split("train.tfrecord", 16)
    write_split("valid.tfrecord", 8)
    write_split("test.tfrecord", 8)

    results = _launch_two_process("_bucketed_cli_worker.py", base)
    by_proc = {r["process"]: r for r in results}
    assert by_proc[0]["ckpt_steps"] == by_proc[1]["ckpt_steps"] == [1, 2]
    # 3 lockstep steps/epoch (1x bucket-0 batch + 2x bucket-1) x 2 epochs
    assert by_proc[0]["global_step"] == by_proc[1]["global_step"] == 6
    assert by_proc[0]["param_fp"] == pytest.approx(
        by_proc[1]["param_fp"], rel=1e-6
    )

    # ---- batch sharding through the same CLI: every process scans the
    # whole corpus (lazily) and emits its half of each GLOBAL bucket
    # batch (--tpu-data-shard=batch); same global geometry here (global
    # sizes [8, 4] -> 3 steps/epoch), identical checkpoints, no
    # collective in the data plane
    bm = _launch_two_process(
        "_bucketed_cli_worker.py", base, extra_args=("batch",),
    )
    bm_by_proc = {r["process"]: r for r in bm}
    assert bm_by_proc[0]["global_step"] == bm_by_proc[1]["global_step"] == 6
    assert bm_by_proc[0]["param_fp"] == pytest.approx(
        bm_by_proc[1]["param_fp"], rel=1e-6
    )

    # ---- preemption consensus: ONE preempted host drags the whole job
    # through the synchronized mid-checkpoint exit -------------------
    # fault: process 0 alone raises SIGTERM at global step 4 (epoch 2,
    # batch 1); the next lockstep consensus point (mid boundary, batch 2)
    # must make BOTH processes save the collective mid checkpoint and
    # exit 143 — a unilateral save would deadlock the collective.
    outs = _launch_two_process(
        "_bucketed_cli_worker.py", base, extra_args=("fault",),
        expect_rc=143,
    )
    assert any("SIGTERM: saved mid-epoch checkpoint" in o for o in outs)
    # resume: restart both processes on the same ckpt dir; they resume
    # from the mid checkpoint and finish; the final checkpoint must be
    # bit-identical to an uninterrupted oracle run (fresh ckpt dir)
    resumed = _launch_two_process(
        "_bucketed_cli_worker.py", base, extra_args=("resume",),
    )
    oracle = _launch_two_process(
        "_bucketed_cli_worker.py", base, extra_args=("oracle",),
    )
    assert resumed[0]["global_step"] == oracle[0]["global_step"] == 6
    assert resumed[0]["param_fp"] == oracle[0]["param_fp"]
