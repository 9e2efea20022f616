"""End-to-end slice: npy+json corpus -> TFRecords -> train -> decode -> utt.

Exercises every layer with a tiny synthetic corpus (SURVEY.md §7 stage 3):
writer, loader/bucketing, model, CTC loss, optimizer, checkpoint/resume,
decode-mode log format and the log2utt scraper.
"""

import io
import json
import os
import sys

import numpy as np
import pytest

FEAT_DIM = 8
VOCAB_TOKENS = ["<PADDING_SYMBOL>", "a", "b", "c", "<SPACE>", "$", "@"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    base = tmp_path_factory.mktemp("corpus")
    rng = np.random.RandomState(0)
    vocab_path = base / "test.vocab"
    vocab_path.write_text("\n".join(VOCAB_TOKENS) + "\n")

    utts = []
    for i in range(8):
        n_frames = int(rng.randint(12, 30))
        feats = rng.randn(n_frames, FEAT_DIM).astype(np.float32)
        key = "utt%02d" % i
        np.save(base / ("%s.None.npy" % key), feats)
        text = "".join(rng.choice(list("abc"), size=rng.randint(2, 5)))
        utts.append({"key": key, "duration": n_frames / 100.0, "text": text})

    for split, sel in [("train", utts[:6]), ("valid", utts[6:]), ("test", utts[6:])]:
        with open(base / ("%s.json" % split), "w") as f:
            for u in sel:
                f.write(json.dumps(u) + "\n")
    return base


def _argv(base, ckpt, extra):
    return [
        "prog",
        "--path-base=%s" % base,
        "--path-vocab=test.vocab",
        "--feat-dim=%d" % FEAT_DIM,
        "--feat-type=None",
        "--prep-data-name=synth",
        "--prep-data-shard=2",
        "--path-train-json=train.json",
        "--path-valid-json=valid.json",
        "--path-test-json=test.json",
        "--path-wrt-tfrecord=tfrecord",
        "--path-train-ptrn=tfrecord/synth-train-None-%d-*-of-*" % FEAT_DIM,
        "--path-valid-ptrn=tfrecord/synth-valid-None-%d-*-of-*" % FEAT_DIM,
        "--path-test-ptrn=tfrecord/synth-test-None-%d-*-of-*" % FEAT_DIM,
        "--path-ckpt=%s" % ckpt,
        "--model-type=lstm",
        "--model-encoder-num=1",
        "--model-dimension=8",
        "--model-lstm-is-cnnfe=False",
        "--train-opti-type=adam",
        "--train-lr-param-k=0.05",
        "--train-batch-dynamic=False",
        "--train-batch-size=3",
        "--train-es-tolerance=100",
        "--model-ckpt-max-to-keep=-1",
        "--decoding-beam-width=4",
    ] + extra


@pytest.fixture(scope="module")
def written_corpus(corpus):
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.config.constants import Tag
    from srf_tpu.data.writer import convert_to_tfrecord, shuffle_records

    logger = Logger(name="e2e", level=Logger.INFO).logger
    config = ParseOption(_argv(corpus, corpus / "ckpt", []), logger,
                         is_print_opts=False).args
    paths, n = convert_to_tfrecord(logger, config, Tag.TRAIN, None)
    assert n == 6 and len(paths) == 2
    convert_to_tfrecord(logger, config, Tag.VALID, None)
    convert_to_tfrecord(logger, config, Tag.TEST, None)
    for p in paths:
        shuffle_records(p, seed=0)
    # idempotency: second call skips
    paths2, n2 = convert_to_tfrecord(logger, config, Tag.TRAIN, None)
    assert n2 == 0 and paths2 == paths
    return corpus


def test_loader_roundtrip(written_corpus):
    from srf_tpu.data.loader import SpeechDataset

    ds = SpeechDataset(
        str(written_corpus / "tfrecord" / "synth-train-None-8-*-of-*"), FEAT_DIM
    )
    assert len(ds) == 6
    assert all(f.shape[1] == FEAT_DIM for f in ds.feats)
    assert all(l.min() >= 1 for l in ds.labels)  # 'a','b','c' -> 1..3


def test_train_decode_cycle(written_corpus, capsys):
    from srf_tpu import trainer_sr

    ckpt = written_corpus / "ckpt"
    # 2 epochs of training
    trainer_sr.main(_argv(written_corpus, ckpt, ["--train-max-epoch=2"]))
    assert (ckpt / "2").exists()

    # resume for one more epoch (epoch_offset from ckpt step)
    trainer_sr.main(_argv(written_corpus, ckpt, ["--train-max-epoch=3"]))
    assert (ckpt / "3").exists()

    capsys.readouterr()
    # decode mode
    trainer_sr.main(_argv(written_corpus, ckpt, ["--train-max-epoch=0"]))
    out = capsys.readouterr().out
    assert 'UTTID: ["utt06"]' in out and 'UTTID: ["utt07"]' in out

    # the reference-style scraper parses our log
    from srf_tpu.utils.log2utt import parse_decode_log

    hyps = dict(parse_decode_log(io.StringIO(out)))
    assert set(hyps) == {"utt06", "utt07"}
    for ids in hyps.values():
        assert all(0 <= i < len(VOCAB_TOKENS) for i in ids)

    # on-device and greedy decode impls produce scrapeable logs too
    for impl in ("device", "greedy"):
        capsys.readouterr()
        trainer_sr.main(
            _argv(written_corpus, ckpt,
                  ["--train-max-epoch=0", "--tpu-decode-impl=%s" % impl])
        )
        out_impl = capsys.readouterr().out
        hyps_impl = dict(parse_decode_log(io.StringIO(out_impl)))
        assert set(hyps_impl) == {"utt06", "utt07"}

    # batched decode (--tpu-decode-batch=2) yields IDENTICAL hypotheses
    capsys.readouterr()
    trainer_sr.main(
        _argv(written_corpus, ckpt,
              ["--train-max-epoch=0", "--tpu-decode-batch=2"])
    )
    out_batched = capsys.readouterr().out
    assert dict(parse_decode_log(io.StringIO(out_batched))) == hyps

    # indivisible batch with --tpu-decode-pad-last: batch size survives
    # (2 utts, batch 3 -> one dummy-padded batch), hypotheses identical
    capsys.readouterr()
    trainer_sr.main(
        _argv(written_corpus, ckpt,
              ["--train-max-epoch=0", "--tpu-decode-batch=3",
               "--tpu-decode-pad-last=True"])
    )
    out_padded = capsys.readouterr().out
    assert dict(parse_decode_log(io.StringIO(out_padded))) == hyps


def test_checkpoint_averaging(written_corpus):
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu import trainer_sr
    from srf_tpu.train.optimizer import get_optimizer
    from srf_tpu.models.registry import build_model
    from srf_tpu.utils.checkpoint import CheckpointManager, average_checkpoints
    import jax

    logger = Logger(name="e2e-avg", level=Logger.INFO).logger
    ckpt = written_corpus / "ckpt"
    config = ParseOption(
        _argv(written_corpus, ckpt, ["--train-max-epoch=3", "--model-average-num=2"]),
        logger, is_print_opts=False,
    ).args
    model, _ = build_model(config, len(VOCAB_TOKENS) + 1, logger)
    tx, _ = get_optimizer(config)
    template = trainer_sr.state_to_tree(
        trainer_sr.state_template(model, config, tx, jax.random.PRNGKey(0))
    )
    avg_state, steps = average_checkpoints(str(ckpt), template, 2, logger=logger)
    assert steps == [2, 3]
    mgr = CheckpointManager(str(ckpt / "avg"), max_to_keep=1)
    mgr.save(1, avg_state)
    mgr.close()
    # averaged params = mean of the two checkpoints, verified on one leaf
    m2 = CheckpointManager(str(ckpt))
    s2 = m2.restore(2, template)
    s3 = m2.restore(3, template)
    m2.close()
    leaf = lambda t: jax.tree.leaves(t["params"])[0]
    np.testing.assert_allclose(
        leaf(avg_state), (np.asarray(leaf(s2)) + np.asarray(leaf(s3))) / 2,
        rtol=1e-6,
    )


def test_mwer_finetune_runs_and_stays_finite(written_corpus, capsys):
    """--train-is-mwer=True fine-tunes from a CTC checkpoint: n-best beam
    decode per batch, expected-WER + interpolated-CTC loss, finite and
    checkpointable (train/mwer.py; the reference's loss_ewerr was dead
    code, tfsr/helper/train_helper.py:192-267)."""
    from srf_tpu import trainer_sr

    ckpt = written_corpus / "ckpt_mwer"
    # short CTC warm-up so the beam has something to rank
    trainer_sr.main(_argv(written_corpus, ckpt, ["--train-max-epoch=2"]))
    capsys.readouterr()
    trainer_sr.main(_argv(written_corpus, ckpt, [
        "--train-max-epoch=4", "--train-is-mwer=True",
        "--tpu-mwer-nbest=3", "--tpu-mwer-lam-ctc=0.1",
        "--train-lr-param-k=0.005",
    ]))
    capsys.readouterr()
    # the metrics JSONL is the deterministic record (log capture is
    # unreliable across repeated in-process trainer invocations)
    metrics = [
        json.loads(line)
        for line in open(ckpt / "metrics.jsonl")
        if line.strip()
    ]
    mwer_epochs = [
        m for m in metrics if m["kind"] == "train_epoch" and m["epoch"] > 2
    ]
    assert len(mwer_epochs) >= 2
    assert all(np.isfinite(m["loss"]) for m in mwer_epochs)


def test_async_checkpoint_roundtrip(tmp_path):
    """--tpu-async-ckpt semantics: save returns before the write is durable,
    every read path waits first, and a fresh (sync) manager sees exactly
    the async-written steps."""
    import jax
    import jax.numpy as jnp
    from srf_tpu.utils.checkpoint import CheckpointManager

    base = {"step": jnp.asarray(0),
            "params": {"w": jnp.arange(12.0).reshape(3, 4)}}
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2,
                            use_async=True)
    for step in (1, 2, 3):
        mgr.save(step, jax.tree.map(lambda x: x + step, base))
    assert mgr.latest_step() == 3  # waits for pending writes
    got = mgr.restore(3, base)
    np.testing.assert_allclose(
        got["params"]["w"], np.arange(12.0).reshape(3, 4) + 3
    )
    mgr.close()
    m2 = CheckpointManager(str(tmp_path / "ck"))
    assert m2.all_steps() == [2, 3]  # max_to_keep honored across async saves
    m2.close()


def test_async_ckpt_cli_trains_resumes_decodes(written_corpus, capsys):
    """The trainer under --tpu-async-ckpt=True writes durable per-epoch
    checkpoints: a second invocation resumes from them and decode works."""
    from srf_tpu import trainer_sr

    ckpt = written_corpus / "ckpt_async"
    trainer_sr.main(_argv(written_corpus, ckpt, [
        "--train-max-epoch=2", "--tpu-async-ckpt=True"]))
    capsys.readouterr()
    trainer_sr.main(_argv(written_corpus, ckpt, [
        "--train-max-epoch=3", "--tpu-async-ckpt=True"]))
    out = capsys.readouterr().out
    assert "Loaded ckpt" in out or (ckpt / "metrics.jsonl").exists()
    metrics = [json.loads(l) for l in open(ckpt / "metrics.jsonl") if l.strip()]
    epochs = [m["epoch"] for m in metrics if m["kind"] == "train_epoch"]
    assert epochs == [1, 2, 3]  # resumed, not retrained
    trainer_sr.main(_argv(written_corpus, ckpt, ["--train-max-epoch=0"]))
    dec = capsys.readouterr().out
    assert dec.count("UTTID:") == 2


def test_stf_state_template_includes_ema():
    """The averaging tool restores checkpoints through the SAME template
    builder as trainer_tf (a drifted copy once dropped the ema_params
    subtree, so averaging an --tpu-ema-decay STF run failed)."""
    import types

    import jax

    from srf_tpu.models.stf import ConvEncoder
    from srf_tpu.train.optimizer import get_optimizer
    from srf_tpu.trainer_tf import stf_state_template

    config = types.SimpleNamespace(
        model_encoder_num=1, model_dimension=8, model_att_head_num=2,
        model_inner_dim=16, feat_dim=8, train_inp_dropout=0.0,
        train_inn_dropout=0.0, train_res_dropout=0.0,
        train_att_dropout=0.0, model_conv_filter_num=4,
        model_conv_layer_num=2, model_initializer="glorot_uniform",
        model_ap_encoder=False, model_ap_decoder=False,
        model_ap_encdec=False, model_ap_width_zero=0,
        model_ap_width_stripe=0, model_ap_scale=0.0,
        tpu_attention_kernel="auto",
        tpu_ema_decay=0.999, tpu_decode_ema=False,
        train_opti_type="adam", train_lr_param_k=0.001,
        model_dimension_k=None, train_warmup_n=100, train_adam_beta1=0.9,
        train_adam_beta2=0.98, train_adam_epsilon=1e-9, train_max_lr=1e9,
    )
    tx, _ = get_optimizer(config)
    model = ConvEncoder.from_config(config, 8)
    state = stf_state_template(model, config, tx, jax.random.PRNGKey(0),
                               in_len_div=4)
    assert state.ema_params is not None  # rides the checkpoint tree
