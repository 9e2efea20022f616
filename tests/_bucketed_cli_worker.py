"""Worker for the 2-process BUCKETED CLI train test.

Runs the real ``trainer_sr.main`` CLI with ``--train-batch-dynamic=True``
(multi-bucket frame-budget batching) across 2 jax.distributed processes:
build_loaders divides the global bucket batch sizes across processes and
the loaders agree on one global bucket-shape schedule (plan_lockstep_epoch)
— the multi-process analog of the reference's MirroredStrategy +
bucket_by_sequence_length path (tfsr/data/load_speech_data.py:161-175,
tfsr/trainer_sr.py:147-149), which the reference only ever ran
single-process.

Corpus (written by the parent test): 16 train utts alternating short
(<=20 frames) / long, so round-robin gives each process 4 short + 4 long.
Bucket geometry: budget 168, manual boundary [20], 4 global replicas ->
global sizes [8, 4], local [4, 2]: each epoch = 1 global batch of bucket 0
+ 2 of bucket 1 = 3 lockstep steps per process.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import _dist_common  # noqa: E402,F401  (env pinning side effect)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from srf_tpu.parallel.distributed import maybe_initialize  # noqa: E402

FEAT = 10
VOCAB_TOKENS = ["<PADDING_SYMBOL>", "a", "b", "c", "<SPACE>", "$", "@"]


def _argv(base, ckpt, extra=()):
    return [
        "prog",
        "--path-base=%s" % base,
        "--path-vocab=test.vocab",
        "--feat-dim=%d" % FEAT,
        "--feat-type=None",
        "--path-train-ptrn=train.tfrecord",
        "--path-valid-ptrn=valid.tfrecord",
        "--path-test-ptrn=test.tfrecord",
        "--path-ckpt=%s" % ckpt,
        "--model-type=lstm",
        "--model-encoder-num=1",
        "--model-dimension=8",
        "--model-lstm-is-cnnfe=False",
        "--train-opti-type=adam",
        "--train-lr-param-k=0.05",
        "--train-batch-dynamic=True",
        "--train-batch-frame=168",
        "--train-batch-buckets=20",
        "--train-max-epoch=2",
        "--train-es-tolerance=100",
        "--model-ckpt-max-to-keep=-1",
        "--decoding-beam-width=4",
    ] + list(extra)


def main():
    base = sys.argv[1]
    # modes (test_two_process_preemption_consensus):
    #   plain  — train 2 epochs, fingerprint (default)
    #   fault  — mid-epoch checkpointing on; process 0 ALONE raises
    #            SIGTERM at global step 4; the consensus point must drag
    #            BOTH processes through the collective mid save + exit 143
    #   resume — same ckpt dir, no fault: resumes from the mid checkpoint
    #   oracle — mid-epoch checkpointing on, fresh ckpt dir, uninterrupted
    #   batch  — like plain, but --tpu-data-shard=batch (+ lazy reads):
    #            every process scans the whole corpus and emits its 1/2
    #            slice of each GLOBAL bucket batch (AutoShardPolicy.DATA
    #            semantics); same global geometry, identical ckpts
    mode = sys.argv[2] if len(sys.argv) > 2 else "plain"
    ckpt = os.path.join(base, {
        "plain": "ckpt", "fault": "ckpt_p", "resume": "ckpt_p",
        "oracle": "ckpt_oracle", "batch": "ckpt_bm",
    }[mode])
    extra = []
    if mode == "batch":
        extra += ["--tpu-data-shard=batch", "--tpu-data-lazy=True"]
    if mode not in ("plain", "batch"):
        extra.append("--tpu-ckpt-every-steps=2")
    if mode == "fault":
        extra += ["--tpu-fault-signal-at-step=4",
                  "--tpu-fault-signal-process=0"]
    assert maybe_initialize(), "SRF_COORDINATOR env missing"
    assert jax.process_count() == 2

    from srf_tpu import trainer_sr

    argv = _argv(base, ckpt, extra)
    trainer_sr.main(argv)  # fault mode: exits 143 inside, never returns

    # fingerprint the final checkpoint: both processes must agree
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.models.registry import build_model
    from srf_tpu.train.optimizer import get_optimizer
    from srf_tpu.utils.checkpoint import CheckpointManager

    logger = Logger(name="bucketed-cli", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    model, _ = build_model(config, len(VOCAB_TOKENS) + 1, logger)
    tx, _ = get_optimizer(config)
    template = trainer_sr.state_to_tree(
        trainer_sr.state_template(model, config, tx, jax.random.PRNGKey(0))
    )
    mgr = CheckpointManager(ckpt)
    steps = mgr.all_steps()
    restored = mgr.restore(steps[-1], template)
    mgr.close()
    param_fp = float(sum(
        jnp.sum(jnp.abs(jnp.asarray(x)))
        for x in jax.tree.leaves(restored["params"])
    ))
    print(json.dumps({
        "process": jax.process_index(),
        "ckpt_steps": [int(s) for s in steps],
        "global_step": int(restored["step"]),
        "param_fp": param_fp,
    }), flush=True)


if __name__ == "__main__":
    main()
