"""Worker for the 2-process lockstep STRESS test (VERDICT r3 item 7).

5,120 utterances per process with heavily skewed per-process length
distributions (see tests/test_lockstep_stress.py for the corpus shape).
Runs BOTH multi-process data modes over the out-of-core
``LazySpeechDataset``:

A. example sharding + ``BucketedLoader(global_sync=True)`` — the
   lockstep planner: two full epochs, schedule fingerprints. Under this
   skew the planner must starve the process-1-only bucket globally (and
   most of the skewed mass) WITHOUT deadlocking.
B. batch sharding (``shard_batches=True``, full dataset on every
   process) — the reference AutoShardPolicy.DATA semantics: one epoch,
   schedule + emitted-utterance fingerprints the parent compares against
   a single-process oracle run.
"""

import hashlib
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import _dist_common  # noqa: E402,F401  (env pinning side effect)

import jax  # noqa: E402

from srf_tpu.data.loader import BucketedLoader, LazySpeechDataset  # noqa: E402
from srf_tpu.parallel.distributed import maybe_initialize  # noqa: E402

BOUNDARIES = [40, 90, 150]
LOCAL_SIZES = [8, 4, 2, 2]
GLOBAL_SIZES = [16, 8, 4, 4]


def main():
    pattern = sys.argv[1]
    assert maybe_initialize(), "SRF_COORDINATOR env missing"
    proc = jax.process_index()
    n_proc = jax.process_count()

    # --- A: example sharding + lockstep planner -------------------------
    t0 = time.perf_counter()
    ds = LazySpeechDataset(
        pattern, 4, with_utt_id=True,
        process_index=proc, process_count=n_proc,
    )
    scan_s = time.perf_counter() - t0
    loader = BucketedLoader(
        ds, BOUNDARIES, LOCAL_SIZES, shuffle=True, seed=7,
        drop_remainder=True, global_sync=True, prefetch=2,
    )

    epochs = []
    parity_ok = True
    seen = set()
    t0 = time.perf_counter()
    for epoch in range(2):
        loader.set_epoch(epoch)
        h = hashlib.md5()
        n = 0
        buckets = [0] * 4
        for batch in loader:
            h.update(repr((batch["bucket"], batch["feats"].shape,
                           batch["labels"].shape)).encode())
            n += 1
            buckets[batch["bucket"]] += 1
            for uid in batch["utt_ids"]:
                # round-robin by global index: process p owns i%2==p
                if int(uid[1:]) % n_proc != proc:
                    parity_ok = False
                if epoch == 0:
                    assert uid not in seen, "duplicate emission %s" % uid
                    seen.add(uid)
        epochs.append({"hash": h.hexdigest(), "batches": n,
                       "bucket_counts": buckets})
    iter_s = time.perf_counter() - t0

    # --- B: batch sharding over the FULL corpus -------------------------
    full_ds = LazySpeechDataset(pattern, 4, with_utt_id=True)
    bloader = BucketedLoader(
        full_ds, BOUNDARIES, GLOBAL_SIZES, shuffle=True, seed=7,
        drop_remainder=True, prefetch=2,
        shard_batches=True, process_index=proc, process_count=n_proc,
    )
    bloader.set_epoch(0)
    t0 = time.perf_counter()
    h_sched = hashlib.md5()
    h_ids = hashlib.md5()
    b_batches = 0
    b_buckets = [0] * 4
    b_emitted = 0
    for batch in bloader:
        h_sched.update(repr((batch["bucket"], batch["feats"].shape,
                             batch["labels"].shape)).encode())
        h_ids.update(",".join(batch["utt_ids"]).encode())
        b_batches += 1
        b_buckets[batch["bucket"]] += 1
        b_emitted += len(batch["utt_ids"])
    b_iter_s = time.perf_counter() - t0

    print(json.dumps({
        "process": proc,
        "local_examples": len(ds),
        "epochs": epochs,
        "parity_ok": parity_ok,
        "unique_emitted": len(seen),
        "scan_s": round(scan_s, 2),
        "iter_s": round(iter_s, 2),
        "batchmode": {
            "sched_hash": h_sched.hexdigest(),
            "ids_hash": h_ids.hexdigest(),
            "batches": b_batches,
            "bucket_counts": b_buckets,
            "emitted": b_emitted,
            "iter_s": round(b_iter_s, 2),
        },
        "peak_rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        // 1024,
    }), flush=True)


if __name__ == "__main__":
    main()
