"""End-to-end smoke of the STF trainer path (trainer_tf)."""

import io
import json

import numpy as np
import pytest

FEAT_DIM = 8
VOCAB_TOKENS = ["<PADDING_SYMBOL>", "a", "b", "c", "<SPACE>", "$", "@"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    base = tmp_path_factory.mktemp("stf_corpus")
    rng = np.random.RandomState(1)
    (base / "test.vocab").write_text("\n".join(VOCAB_TOKENS) + "\n")
    utts = []
    for i in range(6):
        n_frames = int(rng.randint(14, 28))
        np.save(base / ("u%d.None.npy" % i),
                rng.randn(n_frames, FEAT_DIM).astype(np.float32))
        utts.append({
            "key": "u%d" % i, "duration": n_frames / 100.0,
            "text": "".join(rng.choice(list("abc"), size=rng.randint(2, 4))),
        })
    for split, sel in [("train", utts[:4]), ("valid", utts[4:]), ("test", utts[4:])]:
        with open(base / ("%s.json" % split), "w") as f:
            for u in sel:
                f.write(json.dumps(u) + "\n")
    return base


def _argv(base, extra):
    return [
        "prog",
        "--path-base=%s" % base,
        "--path-vocab=test.vocab",
        "--feat-dim=%d" % FEAT_DIM,
        "--feat-type=None",
        "--prep-data-name=synth",
        "--prep-data-shard=1",
        "--path-train-json=train.json",
        "--path-valid-json=valid.json",
        "--path-test-json=test.json",
        "--path-wrt-tfrecord=tfr",
        "--path-train-ptrn=tfr/synth-train-None-8-*-of-*",
        "--path-valid-ptrn=tfr/synth-valid-None-8-*-of-*",
        "--path-test-ptrn=tfr/synth-test-None-8-*-of-*",
        "--path-ckpt=%s/ckpt" % base,
        "--model-type=stf",
        "--model-encoder-num=1",
        "--model-dimension=8",
        "--model-att-head-num=2",
        "--model-inner-dim=16",
        "--model-conv-filter-num=4",
        "--model-ap-scale=1.0",
        "--model-ap-width-zero=1",
        "--model-ap-width-stripe=1",
        "--model-ap-encoder=True",
        "--train-opti-type=adam",
        "--train-lr-param-k=0.01",
        "--train-batch-dynamic=False",
        "--train-batch-size=2",
        "--train-es-tolerance=100",
        "--decoding-beam-width=4",
    ] + extra


def test_stf_train_and_decode(corpus, capsys):
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.config.constants import Tag
    from srf_tpu.data.writer import convert_to_tfrecord
    from srf_tpu import trainer_tf

    logger = Logger(name="stf-e2e", level=Logger.INFO).logger
    config = ParseOption(_argv(corpus, []), logger, is_print_opts=False).args
    for tag in (Tag.TRAIN, Tag.VALID, Tag.TEST):
        convert_to_tfrecord(logger, config, tag, None)

    trainer_tf.main(_argv(corpus, ["--train-max-epoch=1"]))
    assert (corpus / "ckpt" / "1").exists()

    capsys.readouterr()
    trainer_tf.main(_argv(corpus, ["--train-max-epoch=0"]))
    out = capsys.readouterr().out
    from srf_tpu.utils.log2utt import parse_decode_log

    hyps = dict(parse_decode_log(io.StringIO(out)))
    assert set(hyps) == {"u4", "u5"}
