"""2-process lockstep bucketing under stress (VERDICT r3 item 7).

10,240 utterances (5,120 per process) over 16 shard files with heavily
SKEWED per-process length distributions: even scan indices (process 0
under round-robin example sharding) are short-biased, odd indices
(process 1) long-biased, and the longest bucket exists ONLY on
process 1. Two multi-process data modes are stressed:

- example sharding + lockstep planner (``global_sync=True``): the
  globally agreed schedule must starve the process-1-only bucket (and
  the skewed surplus) on every process rather than deadlocking, with
  bit-identical schedules across processes — AND the test records how
  much data that semantics forfeits under adversarial skew;
- batch sharding (``shard_batches=True`` — the reference's tf.data
  AutoShardPolicy.DATA: every worker reads the whole corpus and takes
  its 1/n slice of each global batch, reference: tfsr/trainer_sr.py:
  147-149): immune to the skew — the emitted schedule and utterance
  assignment must match a single-process oracle EXACTLY, which is what
  makes the 2-process loss equal the single-process loss under the
  global-batch normalization.
"""

import hashlib
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


FEAT = 4
N_UTT = 10_240
N_SHARDS = 16
PER_SHARD = N_UTT // N_SHARDS
BOUNDARIES = [40, 90, 150]
GLOBAL_SIZES = [16, 8, 4, 4]


def _length_for(idx, rng):
    """Even scan index: 85% short [10,40], 15% mid [60,145]. Odd: the
    reverse, plus every 64th odd utterance in [150,180] — bucket 3
    exists only on process 1."""
    if idx % 2 == 0:
        if rng.rand() < 0.85:
            return int(rng.randint(10, 41))
        return int(rng.randint(60, 146))
    if (idx // 2) % 64 == 63:
        return int(rng.randint(150, 181))
    if rng.rand() < 0.85:
        return int(rng.randint(60, 146))
    return int(rng.randint(10, 41))


def _write_skewed_corpus(tmp_path):
    """16 shards written shard-major so a record's scan index (sorted
    paths x in-file order — the index round-robin example sharding is
    defined over) equals its write index."""
    from srf_tpu.data.example_proto import encode_example
    from srf_tpu.data.tfrecord import TFRecordWriter

    rng = np.random.RandomState(1234)
    idx = 0
    for s in range(N_SHARDS):
        path = tmp_path / ("stress-%05d-of-%05d.tfrecord" % (s, N_SHARDS))
        with TFRecordWriter(str(path)) as w:
            for _ in range(PER_SHARD):
                t = _length_for(idx, rng)
                feats = rng.randn(t, FEAT).astype(np.float32)
                labels = rng.randint(1, 6, size=3 + idx % 4).astype(np.int64)
                w.write(encode_example({
                    "input_speech": feats.reshape(-1),
                    "target_label": labels,
                    "input_length": np.array([t], np.int64),
                    "target_length": np.array([labels.size], np.int64),
                    "utt_id": [b"u%06d" % idx],
                }))
                idx += 1


def _oracle_batchmode_hashes(pattern):
    """Single-process oracle: the full-corpus schedule, with each global
    batch sliced the way batch sharding slices it. Returns per-process
    (sched_hash, ids_hash, batches, bucket_counts, emitted)."""
    from srf_tpu.data.loader import BucketedLoader, LazySpeechDataset

    ds = LazySpeechDataset(pattern, FEAT, with_utt_id=True)
    loader = BucketedLoader(
        ds, BOUNDARIES, GLOBAL_SIZES, shuffle=True, seed=7,
        drop_remainder=True, prefetch=0,
    )
    loader.set_epoch(0)
    out = []
    for p in range(2):
        out.append({"sched": hashlib.md5(), "ids": hashlib.md5(),
                    "batches": 0, "buckets": [0] * 4, "emitted": 0})
    for batch in loader:
        b = batch["bucket"]
        k = GLOBAL_SIZES[b] // 2
        for p in range(2):
            ids = batch["utt_ids"][p * k:(p + 1) * k]
            feats = batch["feats"][p * k:(p + 1) * k]
            labels = batch["labels"][p * k:(p + 1) * k]
            out[p]["sched"].update(
                repr((b, feats.shape, labels.shape)).encode())
            out[p]["ids"].update(",".join(ids).encode())
            out[p]["batches"] += 1
            out[p]["buckets"][b] += 1
            out[p]["emitted"] += len(ids)
    return [
        {"sched_hash": o["sched"].hexdigest(),
         "ids_hash": o["ids"].hexdigest(),
         "batches": o["batches"], "bucket_counts": o["buckets"],
         "emitted": o["emitted"]}
        for o in out
    ]


def _spawn_workers(pattern):
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    worker = os.path.join(os.path.dirname(__file__),
                          "_lockstep_stress_worker.py")
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
            [sys.executable, worker, pattern],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, (p.returncode, err[-3000:])
        json_lines = [ln for ln in out.strip().splitlines()
                      if ln.startswith("{")]
        assert json_lines, "no JSON line:\n%s" % out[-1000:]
        results.append(json.loads(json_lines[-1]))
    return results


@pytest.mark.slow
def test_two_process_lockstep_stress(tmp_path):
    _write_skewed_corpus(tmp_path)
    pattern = str(tmp_path / "stress-*.tfrecord")

    # one retry: under a fully loaded 1-core host (the full suite) the
    # coordinator handshake can time a worker out — a load flake, not a
    # correctness signal; every correctness assert below is
    # deterministic and would fail on both attempts
    try:
        results = _spawn_workers(pattern)
    except AssertionError:
        results = _spawn_workers(pattern)

    by_proc = {r["process"]: r for r in results}
    p0, p1 = by_proc[0], by_proc[1]
    assert p0["local_examples"] == N_UTT // 2
    assert p1["local_examples"] == N_UTT // 2

    # --- example-sharded lockstep: identical schedules, starved bucket
    for e in range(2):
        assert p0["epochs"][e]["hash"] == p1["epochs"][e]["hash"]
        assert p0["epochs"][e]["batches"] == p1["epochs"][e]["batches"]
        assert p0["epochs"][e]["batches"] > 150  # no deadlock, real work
        # the long bucket exists only on process 1 -> starves globally
        assert p0["epochs"][e]["bucket_counts"][3] == 0
        assert p1["epochs"][e]["bucket_counts"][3] == 0
        for b in range(3):
            assert p0["epochs"][e]["bucket_counts"][b] > 0
    assert p0["epochs"][0]["hash"] != p0["epochs"][1]["hash"]
    for r in results:
        assert r["parity_ok"]
        # under adversarial skew the min-ready semantics forfeits most of
        # the skewed surplus — the documented cost of example sharding
        # (batch mode below keeps everything)
        assert 0 < r["unique_emitted"] < 0.5 * N_UTT // 2

    # --- batch sharding: exact single-process-oracle match
    oracle = _oracle_batchmode_hashes(pattern)
    for p in range(2):
        got = by_proc[p]["batchmode"]
        want = oracle[p]
        assert got["sched_hash"] == want["sched_hash"]
        assert got["ids_hash"] == want["ids_hash"]
        assert got["batches"] == want["batches"]
        assert got["bucket_counts"] == want["bucket_counts"]
        assert got["emitted"] == want["emitted"]
    # the two processes share one schedule and emit disjoint halves
    assert (p0["batchmode"]["sched_hash"]
            == p1["batchmode"]["sched_hash"])
    assert p0["batchmode"]["ids_hash"] != p1["batchmode"]["ids_hash"]
    # batch mode trains on (nearly) everything: every bucket flows,
    # including the bucket example mode starved
    assert p0["batchmode"]["bucket_counts"][3] > 0
    total = p0["batchmode"]["emitted"] + p1["batchmode"]["emitted"]
    assert total > 0.95 * N_UTT
    # out-of-core: index-resident only (full 10k-utt corpus well under
    # a typical eager footprint; the bound is generous for CI noise)
    for r in results:
        assert r["peak_rss_mb"] < 2048
