"""Worker process for the real 2-process distributed DP test.

Launched (twice) by tests/test_distributed.py with SRF_COORDINATOR /
SRF_NUM_PROCESSES / SRF_PROCESS_ID set. Shared setup (localhost CPU
jax.distributed, real loader sharding, global batch assembly over the
2 processes x 2 devices 'data' mesh) lives in tests/_dist_common.py; this
worker runs ONE jitted DP train step and prints the JSON fingerprint
{loss_sum, param_fp} the parent compares against a single-process run on
the identical example set.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests._dist_common import print_fingerprint, worker_setup  # noqa: E402


def main():
    state, batch, mesh, repl, model, tx, rng = worker_setup(sys.argv[1])
    from srf_tpu.train.step import make_apply_fn, make_train_step

    train_step = make_train_step(make_apply_fn(model), tx, 4, mesh=mesh,
                                 donate=False)
    new_state, metrics = train_step(state, batch, rng)
    print_fingerprint(new_state, metrics, repl)


if __name__ == "__main__":
    main()
