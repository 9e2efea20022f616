"""Worker process for the 2-process distributed MWER test.

Same harness as tests/_distributed_worker.py (shared setup in
tests/_dist_common.py) but the step is MWER fine-tuning (train/mwer.py):
each process host-decodes the n-best ONLY for its own logit shards, the
hypothesis/error arrays reassemble onto the mesh, and the jitted
expected-word-error update runs SPMD. Prints the JSON fingerprint
{loss_sum, param_fp} the parent compares against a single-process oracle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests._dist_common import VOCAB, print_fingerprint, worker_setup  # noqa: E402


def main():
    state, batch, mesh, repl, model, tx, rng = worker_setup(sys.argv[1])
    from srf_tpu.train.mwer import make_mwer_train_step
    from srf_tpu.train.step import make_apply_fn, make_logits_fn

    apply_fn = make_apply_fn(model)
    train_step = make_mwer_train_step(
        apply_fn, make_logits_fn(apply_fn), tx, in_len_div=4,
        beam_width=4, n_best=2, blank_id=VOCAB, lam_ctc=0.1, mesh=mesh,
    )
    new_state, metrics = train_step(state, batch, rng)
    print_fingerprint(new_state, metrics, repl)


if __name__ == "__main__":
    main()
