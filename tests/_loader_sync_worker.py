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
    print(json.dumps({
        "process": jax.process_index(),
        "local_examples": len(ds),
        "shapes": shapes,
    }), flush=True)


if __name__ == "__main__":
    main()
