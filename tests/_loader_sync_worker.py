"""Worker for the 2-process loader-lockstep test.

An UNEVEN corpus (5 utterances round-robined 3/2 across 2 processes)
exercises BucketedLoader(global_sync=True): both processes must emit the
SAME static shapes in the same order and the SAME number of batches
(global-min), even though their local shards differ in size and data
maxima — otherwise multi-process SPMD deadlocks (one process steps more
than the other) or assembles mismatched global arrays.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import _dist_common  # noqa: E402,F401  (env pinning side effect)

import jax  # noqa: E402

from srf_tpu.data.loader import BucketedLoader, SpeechDataset  # noqa: E402
from srf_tpu.parallel.distributed import maybe_initialize  # noqa: E402


def main():
    pattern = sys.argv[1]
    assert maybe_initialize(), "SRF_COORDINATOR env missing"
    ds = SpeechDataset(
        pattern, 10, process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    loader = BucketedLoader(
        ds, [], [1], shuffle=True, seed=0, drop_remainder=True,
        global_sync=True, prefetch=0,
    )
    shapes = [
        [list(b["feats"].shape), list(b["labels"].shape)] for b in loader
    ]
    # bucketed (multi-bucket) lockstep: corpus lengths are 20,23,26,29,32
    # (tests/test_distributed.py _write_corpus), boundary 24 splits them
    # 2/3; both processes must emit the same bucket-shape sequence
    ds_ids = SpeechDataset(
        pattern, 10, with_utt_id=True,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    bucketed = BucketedLoader(
        ds_ids, [24], [1, 1], shuffle=True, seed=0, drop_remainder=True,
        global_sync=True, prefetch=0,
    )
    bshapes, bids = [], []
    for b in bucketed:
        bshapes.append([list(b["feats"].shape), list(b["labels"].shape)])
        bids.append(b["utt_ids"])
    print(json.dumps({
        "process": jax.process_index(),
        "local_examples": len(ds),
        "shapes": shapes,
        "bucketed_shapes": bshapes,
        "bucketed_ids": bids,
    }), flush=True)


if __name__ == "__main__":
    main()
