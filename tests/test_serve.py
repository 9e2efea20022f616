"""Serving API test: train tiny model, load via Recognizer, transcribe."""

import json

import numpy as np
import pytest

FEAT_DIM = 8
VOCAB_TOKENS = ["<PADDING_SYMBOL>", "a", "b", "c", "<SPACE>", "$", "@"]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    base = tmp_path_factory.mktemp("serve_corpus")
    rng = np.random.RandomState(3)
    (base / "test.vocab").write_text("\n".join(VOCAB_TOKENS) + "\n")
    utts = []
    for i in range(4):
        n = int(rng.randint(12, 24))
        np.save(base / ("u%d.None.npy" % i),
                rng.randn(n, FEAT_DIM).astype(np.float32))
        utts.append({"key": "u%d" % i, "duration": n / 100.0, "text": "ab"})
    for split in ("train", "valid", "test"):
        with open(base / ("%s.json" % split), "w") as f:
            for u in utts:
                f.write(json.dumps(u) + "\n")

    argv = [
        "prog", "--path-base=%s" % base, "--path-vocab=test.vocab",
        "--feat-dim=%d" % FEAT_DIM, "--feat-type=None",
        "--prep-data-name=synth", "--prep-data-shard=1",
        "--path-train-json=train.json", "--path-valid-json=valid.json",
        "--path-test-json=test.json", "--path-wrt-tfrecord=tfr",
        "--path-train-ptrn=tfr/synth-train-None-8-*-of-*",
        "--path-valid-ptrn=tfr/synth-valid-None-8-*-of-*",
        "--path-test-ptrn=tfr/synth-test-None-8-*-of-*",
        "--path-ckpt=%s/ckpt" % base,
        "--model-type=lstm", "--model-encoder-num=1", "--model-dimension=8",
        "--train-opti-type=adam", "--train-lr-param-k=0.05",
        "--train-batch-dynamic=False", "--train-batch-size=2",
        "--train-es-tolerance=100", "--decoding-beam-width=4",
    ]
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.config.constants import Tag
    from srf_tpu.data.writer import convert_to_tfrecord
    from srf_tpu import trainer_sr

    logger = Logger(name="serve-e2e", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    for tag in (Tag.TRAIN, Tag.VALID, Tag.TEST):
        convert_to_tfrecord(logger, config, tag, None)
    trainer_sr.main(argv + ["--train-max-epoch=1"])
    return argv, base


def test_recognizer_transcribes(trained):
    argv, base = trained
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer

    logger = Logger(name="serve-test", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    recognizer = Recognizer(config, logger)
    feats = np.load(base / "u0.None.npy")
    ids, text = recognizer.transcribe(feats, beam_width=4, corpus="wsj")
    assert all(0 <= i < len(VOCAB_TOKENS) for i in ids)
    assert isinstance(text, str)
    # greedy path too
    ids2, _ = recognizer.transcribe(feats, beam_width=None, corpus="wsj")
    assert all(0 <= i < len(VOCAB_TOKENS) for i in ids2)


def test_serving_ignores_optimizer_flags(trained):
    """Serving restores params-only: a Recognizer built with a DIFFERENT
    optimizer configuration than training must still load and decode
    identically (the checkpoint's Adam state is simply skipped)."""
    argv, base = trained
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer

    logger = Logger(name="serve-test", level=Logger.INFO).logger
    swapped = [a for a in argv
               if not a.startswith(("--train-opti-type", "--train-lr-param-k"))]
    swapped += ["--train-opti-type=sgd", "--train-lr-param-k=0.5"]
    config = ParseOption(swapped, logger, is_print_opts=False).args
    recognizer = Recognizer(config, logger)
    feats = np.load(base / "u0.None.npy")
    ids, _ = recognizer.transcribe(feats, beam_width=4, corpus="wsj")

    ref_config = ParseOption(argv, logger, is_print_opts=False).args
    ref_ids, _ = Recognizer(ref_config, logger).transcribe(
        feats, beam_width=4, corpus="wsj"
    )
    assert ids == ref_ids


def test_serving_rejects_wrong_architecture(trained):
    """Partial restore must fail LOUDLY when the serving flags describe a
    different architecture (fewer/more layers) than the checkpoint."""
    argv, base = trained
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer

    logger = Logger(name="serve-test", level=Logger.INFO).logger
    bigger = [a for a in argv if not a.startswith("--model-encoder-num")]
    bigger += ["--model-encoder-num=2"]  # checkpoint has 1 LSTM layer
    config = ParseOption(bigger, logger, is_print_opts=False).args
    with pytest.raises(ValueError, match="no leaf|smaller architecture"):
        Recognizer(config, logger)


def test_transcribe_batch_matches_single(trained):
    """One batched dispatch == per-utterance transcribe (beam and greedy),
    including ragged lengths."""
    argv, base = trained
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer

    logger = Logger(name="serve-test", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    recognizer = Recognizer(config, logger)
    feats_list = [
        np.load(base / "u0.None.npy"),
        np.load(base / "u1.None.npy")[:-7],
        np.load(base / "u2.None.npy"),
    ]
    for beam in (4, None):
        batched = recognizer.transcribe_batch(
            feats_list, beam_width=beam, corpus="wsj"
        )
        for f, (ids_b, text_b) in zip(feats_list, batched):
            ids_s, text_s = recognizer.transcribe(
                f, beam_width=beam, corpus="wsj"
            )
            assert ids_b == ids_s, (beam, ids_b, ids_s)
            assert text_b == text_s


@pytest.fixture(scope="module")
def trained_srf(tmp_path_factory):
    """Tiny SRF checkpoint (streaming requires the SRF front-end)."""
    base = tmp_path_factory.mktemp("serve_srf")
    rng = np.random.RandomState(5)
    (base / "test.vocab").write_text("\n".join(VOCAB_TOKENS) + "\n")
    utts = []
    for i in range(4):
        n = int(rng.randint(20, 40))
        np.save(base / ("u%d.None.npy" % i),
                rng.randn(n, FEAT_DIM).astype(np.float32))
        utts.append({"key": "u%d" % i, "duration": n / 100.0, "text": "ab"})
    for split in ("train", "valid", "test"):
        with open(base / ("%s.json" % split), "w") as f:
            for u in utts:
                f.write(json.dumps(u) + "\n")
    argv = [
        "prog", "--path-base=%s" % base, "--path-vocab=test.vocab",
        "--feat-dim=%d" % FEAT_DIM, "--feat-type=None",
        "--prep-data-name=synth", "--prep-data-shard=1",
        "--path-train-json=train.json", "--path-valid-json=valid.json",
        "--path-test-json=test.json", "--path-wrt-tfrecord=tfr",
        "--path-train-ptrn=tfr/synth-train-None-8-*-of-*",
        "--path-valid-ptrn=tfr/synth-valid-None-8-*-of-*",
        "--path-test-ptrn=tfr/synth-test-None-8-*-of-*",
        "--path-ckpt=%s/ckpt" % base,
        "--model-type=srf", "--model-caps-type=naive",
        "--model-caps-context=True", "--model-encoder-num=2",
        "--model-caps-primary-num=6", "--model-caps-primary-dim=4",
        "--model-caps-convolution-num=5", "--model-caps-convolution-dim=4",
        "--model-caps-class-dim=4", "--model-caps-iter=1",
        "--model-caps-window-lpad=1", "--model-caps-window-rpad=1",
        "--model-conv-layer-num=2", "--model-conv-filter-num=8",
        "--train-opti-type=adam", "--train-lr-param-k=0.05",
        "--train-batch-dynamic=False", "--train-batch-size=2",
        "--train-es-tolerance=100", "--decoding-beam-width=4",
    ]
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.config.constants import Tag
    from srf_tpu.data.writer import convert_to_tfrecord
    from srf_tpu import trainer_sr

    logger = Logger(name="serve-srf", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    for tag in (Tag.TRAIN, Tag.VALID, Tag.TEST):
        convert_to_tfrecord(logger, config, tag, None)
    trainer_sr.main(argv + ["--train-max-epoch=1"])
    return argv, base


def test_streaming_session_matches_transcribe(trained_srf):
    """Recognizer.streaming_session must reproduce the batch greedy ids."""
    argv, base = trained_srf
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer

    logger = Logger(name="serve-stream", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    recognizer = Recognizer(config, logger)
    feats = np.load(base / "u0.None.npy")
    want_ids, _ = recognizer.transcribe(feats, beam_width=None, corpus="wsj")

    session = recognizer.streaming_session(chunk=4)
    got = []
    for start in range(0, feats.shape[0], 9):
        got += session.push(feats[start : start + 9])
    got += session.flush()
    assert got == want_ids


def test_align_cli_writes_ctm(trained, tmp_path):
    """tools/align end to end: CTM tokens spell each reference transcript
    in order with non-overlapping, in-range times."""
    argv, base = trained
    from srf_tpu.tools import align

    # bare manifest keys: align resolves key + ".<feat_type>.npy", the
    # same rule as the TFRecord writer without --decoding-from-npy
    out = tmp_path / "align.ctm"
    align.main(argv + ["--tpu-align-out=%s" % out])
    lines = out.read_text().strip().splitlines()
    per_utt = {}
    for line in lines:
        utt, _ch, start, dur, tok = line.split()[:5]
        per_utt.setdefault(utt, []).append((float(start), float(dur), tok))
    # every aligned utterance spells its reference ("ab") in order
    for utt, toks in per_utt.items():
        assert [t for _, _, t in toks] == ["a", "b"], (utt, toks)
        starts = [s for s, _, _ in toks]
        assert starts == sorted(starts)
        assert all(d > 0 for _, d, _ in toks)


def test_transcribe_long_single_segment_matches_streaming(trained_srf):
    """With an endpoint threshold that never fires, transcribe_long yields
    ONE segment whose ids equal the plain streaming session's output, with
    well-formed global timestamps."""
    argv, base = trained_srf
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer

    logger = Logger(name="serve-long", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    recognizer = Recognizer(config, logger)
    feats = np.load(base / "u1.None.npy")

    session = recognizer.streaming_session(chunk=4)
    want = session.push(feats) + session.flush()

    segments = recognizer.transcribe_long(
        feats, chunk=4, endpoint_blanks=10**9, corpus="wsj"
    )
    if not want:
        assert segments == []
        return
    (seg,) = segments
    assert seg["ids"] == want
    shift = 0.01 * recognizer.in_len_div
    assert len(seg["times"]) == len(seg["ids"])
    assert seg["start_s"] == 0.0
    assert seg["end_s"] >= max(seg["times"] + [0.0])
    assert all(
        t == pytest.approx(f * shift, abs=1e-4)
        for f, t in zip(seg["frames"], seg["times"])
    )


def test_transcribe_long_max_segment_bound(trained_srf):
    """With a tiny max_segment_s, continuous speech (no silence) still
    splits into multiple bounded segments covering the stream in order."""
    argv, base = trained_srf
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer

    logger = Logger(name="serve-long2", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    recognizer = Recognizer(config, logger)
    rng = np.random.RandomState(11)
    feats = np.concatenate(
        [np.load(base / ("u%d.None.npy" % i)) for i in (0, 1, 2, 3)] * 2
    ) + 0.01 * rng.randn(1, FEAT_DIM).astype(np.float32)

    shift = 0.01 * recognizer.in_len_div
    segments = recognizer.transcribe_long(
        feats, chunk=4, endpoint_blanks=10**9, corpus="wsj",
        max_segment_s=8 * shift,
    )
    if not segments:
        pytest.skip("randomly-trained model emitted nothing")
    assert len(segments) >= 2  # the bound forced splits without silence
    prev_end = 0.0
    for seg in segments:
        assert seg["start_s"] >= prev_end - 1e-9
        prev_end = seg["end_s"]
        assert all(
            seg["start_s"] - 1e-9 <= t < seg["end_s"] + 1e-9
            for t in seg["times"]
        )


def test_restore_on_different_topology(trained):
    """A checkpoint written under this process's 8-virtual-device mesh
    must restore in a fresh 1-device process (train on a pod, serve on
    one chip): restore_partial passes the template's own shardings to
    orbax instead of trusting the save-time sharding file."""
    import subprocess
    import sys

    argv, base = trained
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "from srf_tpu.config import Logger, ParseOption\n"
        "from srf_tpu.serve import Recognizer\n"
        "import numpy as np\n"
        "logger = Logger(name='topo', level=Logger.INFO).logger\n"
        "config = ParseOption(%r, logger, is_print_opts=False).args\n"
        "rec = Recognizer(config, logger)\n"
        "ids, text = rec.transcribe(np.load(%r), beam_width=4,\n"
        "                           corpus='wsj')\n"
        "print('TOPO_OK', ids)\n" % (list(argv), str(base / "u0.None.npy"))
    )
    env = dict(
        __import__("os").environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        JAX_PLATFORMS="cpu",
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, cwd=str(__import__("pathlib").Path(__file__).parent.parent),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "TOPO_OK" in out.stdout


def test_hot_reload_swaps_params(trained):
    """Recognizer.reload() serves a NEWLY SAVED checkpoint without
    restarting: the jitted forward takes params as arguments (not baked
    closure constants), so the swap changes the logits and matches a
    fresh Recognizer built on the new checkpoint."""
    import jax
    import jax.numpy as jnp

    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer
    from srf_tpu.utils.checkpoint import CheckpointManager

    argv, base = trained
    logger = Logger(name="reload", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    rec = Recognizer(config, logger)
    step0 = int(jax.device_get(rec.state.step))

    rng = np.random.RandomState(11)
    feats = rng.randn(18, FEAT_DIM).astype(np.float32)
    before = np.asarray(rec._forward(
        rec.state.params, rec.state.batch_stats,
        jnp.asarray(feats[None]), jnp.asarray([18]),
    ))

    # nothing newer yet -> no-op
    assert rec.reload() is None

    # write a perturbed checkpoint at step+1 (a "new epoch" landing)
    mgr = CheckpointManager(config.path_ckpt)
    # perturb the live params and save them as the next step
    perturbed = jax.tree.map(lambda x: x + 0.1, rec.state.params)
    mgr.save(step0 + 1, {
        "step": np.asarray(step0 + 1, np.int32),
        "params": jax.device_get(perturbed),
        "batch_stats": jax.device_get(rec.state.batch_stats),
    })
    mgr.close()

    assert rec.reload() == step0 + 1
    assert int(jax.device_get(rec.state.step)) == step0 + 1
    after = np.asarray(rec._forward(
        rec.state.params, rec.state.batch_stats,
        jnp.asarray(feats[None]), jnp.asarray([18]),
    ))
    assert not np.allclose(before, after), "reload did not change weights"

    # a fresh Recognizer on the new checkpoint agrees exactly
    rec2 = Recognizer(config, logger)
    fresh = np.asarray(rec2._forward(
        rec2.state.params, rec2.state.batch_stats,
        jnp.asarray(feats[None]), jnp.asarray([18]),
    ))
    np.testing.assert_allclose(after, fresh, rtol=1e-6, atol=1e-7)

    # transcription still runs end to end after the swap
    ids, text = rec.transcribe(feats, beam_width=4)
    assert isinstance(text, str)


def test_reload_poller_calls_reload():
    from srf_tpu.serve_daemon import start_reload_poller

    class Stub:
        def __init__(self):
            self.calls = 0

        def reload(self):
            self.calls += 1
            return 7 if self.calls == 1 else None

    stub = Stub()
    stop, thread = start_reload_poller(stub, 0.05)
    import time as _time

    deadline = _time.monotonic() + 5.0
    while stub.calls < 3 and _time.monotonic() < deadline:
        _time.sleep(0.02)
    stop.set()
    thread.join(timeout=5.0)
    assert stub.calls >= 3


def test_shallow_fusion_through_serving(trained, tmp_path):
    """--tpu-lm-* flags end to end: the CLI tool trains an LM from the
    corpus manifests; Recognizer fuses it on the beam path. Weight 0 must
    reproduce the acoustic-only hypotheses exactly; a large weight pulls
    hypotheses toward LM-probable token sequences."""
    argv, base = trained
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.ops.ngram_lm import NGramLM
    from srf_tpu.serve import Recognizer
    from srf_tpu.tools import train_ngram_lm

    logger = Logger(name="serve-lm", level=Logger.INFO).logger
    lm_path = str(tmp_path / "lm.npz")
    train_ngram_lm.main(
        ["prog", "--tpu-lm-out", lm_path, "--tpu-lm-order=2"] + argv[1:]
    )
    lm = NGramLM.load(lm_path)
    assert lm.order == 2 and lm.vocab_size == len(VOCAB_TOKENS)
    np.testing.assert_allclose(
        np.exp(lm.table).sum(axis=-1), 1.0, rtol=1e-5
    )

    feats = np.load(base / "u0.None.npy")
    plain = Recognizer(
        ParseOption(argv, logger, is_print_opts=False).args, logger
    )
    base_ids, _ = plain.transcribe(feats, beam_width=4, corpus="wsj")

    fused0 = Recognizer(
        ParseOption(
            argv + ["--tpu-lm-path=%s" % lm_path, "--tpu-lm-weight=0.0"],
            logger, is_print_opts=False,
        ).args,
        logger,
    )
    ids0, _ = fused0.transcribe(feats, beam_width=4, corpus="wsj")
    assert ids0 == base_ids

    heavy = Recognizer(
        ParseOption(
            argv + ["--tpu-lm-path=%s" % lm_path, "--tpu-lm-weight=50.0"],
            logger, is_print_opts=False,
        ).args,
        logger,
    )
    ids_heavy, _ = heavy.transcribe(feats, beam_width=4, corpus="wsj")
    # training text is only ever "ab": an overwhelming LM only lets
    # corpus-plausible tokens through (ids 1='a', 2='b') or nothing
    assert all(i in (1, 2) for i in ids_heavy)


def test_streaming_fuses_recognizer_lm(trained_srf, tmp_path):
    """The Recognizer's --tpu-lm-path reaches BOTH streaming beam paths:
    the streamed beam (beam_width at session construction) and the
    flush(beam_width=N) offline rescore from a greedy session — each must
    equal the Recognizer's own fused batch decode."""
    argv, base = trained_srf
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer
    from srf_tpu.tools import train_ngram_lm

    logger = Logger(name="serve-stream-lm", level=Logger.INFO).logger
    lm_path = str(tmp_path / "lm.npz")
    train_ngram_lm.main(
        ["prog", "--tpu-lm-out", lm_path, "--tpu-lm-order=2"] + argv[1:]
    )
    config = ParseOption(
        argv + ["--tpu-lm-path=%s" % lm_path, "--tpu-lm-weight=2.0",
                "--tpu-lm-bonus=0.3"],
        logger, is_print_opts=False,
    ).args
    rec = Recognizer(config, logger)
    feats = np.load(base / "u1.None.npy")
    want_ids, _ = rec.transcribe(feats, beam_width=4, corpus="wsj")

    # streamed fused beam
    session = rec.streaming_session(chunk=4, beam_width=4)
    for start in range(0, feats.shape[0], 9):
        session.push(feats[start:start + 9])
    ids, _score = session.flush()
    assert ids == want_ids

    # greedy session, fused offline rescore at flush
    session = rec.streaming_session(chunk=4)
    for start in range(0, feats.shape[0], 9):
        session.push(feats[start:start + 9])
    ids = list(session.flush(beam_width=4))
    assert ids == want_ids
