"""Dynamic-batching serving daemon: coalescing, TCP round trip, latency.

The daemon has no reference analog (the reference's only inference path is
the trainer's offline decode mode, tfsr/trainer_sr.py:290-299); its
correctness contract is: batched answers == one-by-one answers, single
requests are flushed by the wait timeout, and concurrent requests coalesce
into fewer dispatches.
"""

import threading

import numpy as np
import pytest

from tests.test_serve import trained  # noqa: F401  (shared trained model)


@pytest.fixture(scope="module")
def recognizer(trained):  # noqa: F811
    argv, base = trained
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer

    logger = Logger(name="daemon-test", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    return Recognizer(config, logger), base


def test_coalesced_batches_match_single_requests(recognizer):
    from srf_tpu.serve_daemon import BatchingFrontend

    rec, base = recognizer
    feats = [np.load(base / ("u%d.None.npy" % i)) for i in range(4)]
    want = [rec.transcribe(f, beam_width=4, corpus="wsj") for f in feats]

    frontend = BatchingFrontend(rec, max_batch=4, max_wait_ms=500,
                                beam_width=4)
    try:
        barrier = threading.Barrier(4)
        futures = [None] * 4

        def client(i):
            barrier.wait()
            futures[i] = frontend.submit(feats[i], corpus="wsj")

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        got = [f.result(timeout=120) for f in futures]
    finally:
        frontend.close()

    assert [ids for ids, _ in got] == [ids for ids, _ in want]
    assert [txt for _, txt in got] == [txt for _, txt in want]
    # the concurrent submits coalesced (fewer dispatches than requests)
    assert frontend.stats["requests"] == 4
    assert max(frontend.stats["batch_sizes"]) > 1


def test_single_request_flushed_by_timeout(recognizer):
    from srf_tpu.serve_daemon import BatchingFrontend

    rec, base = recognizer
    frontend = BatchingFrontend(rec, max_batch=16, max_wait_ms=5,
                                beam_width=4)
    try:
        feats = np.load(base / "u0.None.npy")
        ids, text = frontend.transcribe(feats, corpus="wsj", timeout=120)
    finally:
        frontend.close()
    want_ids, want_text = rec.transcribe(feats, beam_width=4, corpus="wsj")
    assert ids == want_ids and text == want_text
    # pad_batch keeps the dispatch shape at max_batch rows
    assert frontend.stats["batch_sizes"] == [1]


def test_tcp_round_trip(recognizer, trained):  # noqa: F811
    import srf_tpu.serve_daemon as sd
    from srf_tpu.config import Logger, ParseOption

    argv, base = trained
    rec, _ = recognizer
    logger = Logger(name="daemon-tcp", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args

    ready = threading.Event()
    thread = threading.Thread(
        target=sd.serve,
        kwargs=dict(config=config, host="127.0.0.1", port=0, max_batch=4,
                    max_wait_ms=5, logger=logger, ready_event=ready),
        daemon=True,
    )
    thread.start()
    assert ready.wait(timeout=300)
    server = ready.server
    port = server.server_address[1]
    try:
        for i in range(2):
            feats = np.load(base / ("u%d.None.npy" % i))
            ids, text = sd.request("127.0.0.1", port, feats, corpus="wsj")
            want_ids, want_text = rec.transcribe(
                feats, beam_width=4, corpus="wsj"
            )
            assert ids == want_ids and text == want_text
        stats = sd.stats_request("127.0.0.1", port)
        assert stats["requests"] == 2
        assert stats["batches"] >= 1
        assert stats["serving_step"] >= 1
        assert stats["max_batch"] == 4
        assert stats["quantized"] is False
    finally:
        server.shutdown()
        thread.join(timeout=30)


def test_daemon_hot_reload_over_tcp(recognizer, trained):  # noqa: F811
    """The reload poller swaps to a checkpoint saved WHILE the daemon is
    serving: stats' serving_step bumps without a restart."""
    import jax
    import numpy as np

    import srf_tpu.serve_daemon as sd
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.utils.checkpoint import CheckpointManager

    argv, base = trained
    logger = Logger(name="daemon-reload", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args

    ready = threading.Event()
    thread = threading.Thread(
        target=sd.serve,
        kwargs=dict(config=config, host="127.0.0.1", port=0, max_batch=4,
                    max_wait_ms=5, reload_secs=0.2, logger=logger,
                    ready_event=ready),
        daemon=True,
    )
    thread.start()
    assert ready.wait(timeout=300)
    server = ready.server
    port = server.server_address[1]
    try:
        step0 = sd.stats_request("127.0.0.1", port)["serving_step"]

        # land a new checkpoint while serving
        rec, _ = recognizer
        mgr = CheckpointManager(config.path_ckpt)
        mgr.save(step0 + 1, {
            "step": np.asarray(step0 + 1, np.int32),
            "params": jax.device_get(
                jax.tree.map(lambda x: x + 0.05, rec.state.params)),
            "batch_stats": jax.device_get(rec.state.batch_stats),
        })
        mgr.close()

        import time as _time

        deadline = _time.monotonic() + 60
        serving = step0
        while serving != step0 + 1 and _time.monotonic() < deadline:
            _time.sleep(0.2)
            serving = sd.stats_request("127.0.0.1", port)["serving_step"]
        assert serving == step0 + 1, "poller never swapped to the new ckpt"

        # requests still served after the swap
        feats = np.load(base / "u0.None.npy")
        ids, text = sd.request("127.0.0.1", port, feats, corpus="wsj")
        assert isinstance(text, str)
    finally:
        server.shutdown()
        thread.join(timeout=30)


def test_http_gateway_round_trip(recognizer, trained):  # noqa: F811
    """The REST gateway (--daemon-http-port): POST /v1/transcribe (both
    JSON-array and base64-raw encodings) matches direct transcription;
    GET /v1/health reports the shared frontend's stats; malformed
    requests get a 400 with an error body, not a closed socket."""
    import base64
    import json
    import urllib.error
    import urllib.request

    import srf_tpu.serve_daemon as sd
    from srf_tpu.config import Logger, ParseOption

    argv, base = trained
    logger = Logger(name="daemon-http", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    # a FRESH recognizer for the oracle: earlier tests (hot reload) may
    # have landed newer checkpoints than the module-scoped fixture holds,
    # and the daemon below loads the newest one too
    from srf_tpu.serve import Recognizer

    rec = Recognizer(config, logger)

    ready = threading.Event()
    thread = threading.Thread(
        target=sd.serve,
        kwargs=dict(config=config, host="127.0.0.1", port=0, http_port=0,
                    max_batch=4, max_wait_ms=5, logger=logger,
                    ready_event=ready),
        daemon=True,
    )
    thread.start()
    assert ready.wait(timeout=300)
    server, http_server = ready.server, ready.http_server
    url = "http://127.0.0.1:%d" % http_server.server_address[1]

    def post(path, obj):
        req = urllib.request.Request(
            url + path, data=json.dumps(obj).encode("utf-8"),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read().decode("utf-8"))

    try:
        feats = np.load(base / "u0.None.npy")
        want_ids, want_text = rec.transcribe(feats, beam_width=4,
                                             corpus="wsj")
        got = post("/v1/transcribe",
                   {"feats": feats.tolist(), "corpus": "wsj"})
        assert got["ids"] == want_ids and got["text"] == want_text

        raw = np.ascontiguousarray(feats, "<f4")
        got64 = post("/v1/transcribe", {
            "shape": list(feats.shape),
            "data_b64": base64.b64encode(raw.tobytes()).decode("ascii"),
            "corpus": "wsj",
        })
        assert got64["ids"] == want_ids

        with urllib.request.urlopen(url + "/v1/health", timeout=30) as resp:
            health = json.loads(resp.read().decode("utf-8"))
        assert health["status"] == "ok" and health["requests"] == 2

        try:
            post("/v1/transcribe", {"feats": [[1.0, 2.0]]})  # wrong dim
            raise AssertionError("malformed request did not 400")
        except urllib.error.HTTPError as err:
            assert err.code == 400
            assert "error" in json.loads(err.read().decode("utf-8"))
    finally:
        server.shutdown()
        thread.join(timeout=30)


def test_fleet_multi_model_routing(recognizer, trained, tmp_path):  # noqa: F811
    """--daemon-fleet: one daemon, several named models. Requests route by
    name (omitted = default), per-model stats are reported, and unknown
    names fail alone without touching other requests."""
    import json as _json

    import srf_tpu.serve_daemon as sd
    from srf_tpu.config import Logger

    argv, base = trained
    rec, _ = recognizer
    logger = Logger(name="daemon-fleet", level=Logger.INFO).logger
    # two fleet entries over the same checkpoint with observably
    # different decode configs: 'acc' beams, 'fast' decodes greedy
    spec = {
        "default": "acc",
        "models": {
            "acc": {"args": argv[1:] + ["--decoding-beam-width=4"]},
            "fast": {"args": argv[1:] + ["--decoding-beam-width=1"]},
        },
    }
    spec_path = tmp_path / "fleet.json"
    spec_path.write_text(_json.dumps(spec))
    model_configs = sd.load_fleet_spec(str(spec_path), [], logger=logger)
    assert list(model_configs) == ["acc", "fast"]

    ready = threading.Event()
    thread = threading.Thread(
        target=sd.serve,
        kwargs=dict(config=None, host="127.0.0.1", port=0, max_batch=4,
                    max_wait_ms=5, logger=logger, ready_event=ready,
                    http_port=0, model_configs=model_configs),
        daemon=True,
    )
    thread.start()
    assert ready.wait(timeout=600)
    server = ready.server
    port = server.server_address[1]
    try:
        feats = np.load(base / "u0.None.npy")
        # expectations from FRESH Recognizers on the same configs (the
        # module-scoped fixture may hold older weights: the hot-reload
        # test lands a newer checkpoint in the shared ckpt dir)
        from srf_tpu.serve import Recognizer

        want_beam = Recognizer(model_configs["acc"], logger).transcribe(
            feats, beam_width=4, corpus="wsj")
        want_greedy = Recognizer(model_configs["fast"], logger).transcribe(
            feats, beam_width=None, corpus="wsj")

        got_default = sd.request("127.0.0.1", port, feats, corpus="wsj")
        got_acc = sd.request("127.0.0.1", port, feats, corpus="wsj",
                             model="acc")
        got_fast = sd.request("127.0.0.1", port, feats, corpus="wsj",
                              model="fast")
        assert got_default == want_beam == got_acc
        assert got_fast == want_greedy

        with pytest.raises(RuntimeError, match="unknown model"):
            sd.request("127.0.0.1", port, feats, model="nope")

        stats = sd.stats_request("127.0.0.1", port)
        assert stats["default_model"] == "acc"
        assert stats["models"]["acc"]["requests"] == 2
        assert stats["models"]["fast"]["requests"] == 1

        # HTTP gateway routes by model too
        import urllib.request as _url

        http_port = ready.http_server.server_address[1]
        body = _json.dumps({
            "feats": feats.tolist(), "corpus": "wsj", "model": "fast",
        }).encode()
        reply = _json.loads(_url.urlopen(_url.Request(
            "http://127.0.0.1:%d/v1/transcribe" % http_port, data=body,
            headers={"Content-Type": "application/json"},
        ), timeout=120).read())
        assert (list(reply["ids"]), reply["text"]) == want_greedy
        health = _json.loads(_url.urlopen(
            "http://127.0.0.1:%d/v1/health" % http_port, timeout=30
        ).read())
        assert set(health["models"]) == {"acc", "fast"}
    finally:
        server.shutdown()
        thread.join(timeout=30)


def test_detailed_scoring_fields(recognizer):
    """transcribe_batch_detailed + the daemon's detailed path: score is
    the hypothesis log-score, confidence = exp(avg_logp) in (0, 1], and
    the plain tuple API is unchanged."""
    from srf_tpu.serve_daemon import BatchingFrontend

    rec, base = recognizer
    feats = np.load(base / "u0.None.npy")
    for beam in (4, None):
        details = rec.transcribe_batch_detailed(
            [feats], beam_width=beam, corpus="wsj"
        )
        (d,) = details
        assert d["score"] <= 0.0 and np.isfinite(d["score"])
        assert 0.0 < d["confidence"] <= 1.0
        assert abs(d["avg_logp"]) >= abs(d["score"]) / 10000
        ids, text = rec.transcribe(feats, beam_width=beam, corpus="wsj")
        assert ids == d["ids"] and text == d["text"]
        # per-symbol emission timestamps: one frame per symbol, strictly
        # increasing, times = frames x 10 ms x subsampling
        assert len(d["frames"]) == len(d["ids"])
        assert all(b > a for a, b in zip(d["frames"], d["frames"][1:]))
        shift = 0.01 * rec.in_len_div
        assert d["times"] == [round(f * shift, 4) for f in d["frames"]]
        assert len(d["token_confidences"]) == len(d["ids"])
        assert all(0.0 <= c <= 1.0 for c in d["token_confidences"])

    frontend = BatchingFrontend(rec, max_batch=4, max_wait_ms=5,
                                beam_width=4)
    try:
        detail = frontend.submit(feats, corpus="wsj",
                                 detailed=True).result(timeout=120)
        plain = frontend.submit(feats, corpus="wsj").result(timeout=120)
    finally:
        frontend.close()
    assert plain == (detail["ids"], detail["text"])
    assert 0.0 < detail["confidence"] <= 1.0

    # n-best through the coalescing frontend: ranked, top == the 1-best
    frontend = BatchingFrontend(rec, max_batch=4, max_wait_ms=5,
                                beam_width=4)
    try:
        d3 = frontend.submit(feats, corpus="wsj", detailed=True,
                             n_best=3).result(timeout=120)
        d1 = frontend.submit(feats, corpus="wsj",
                             detailed=True).result(timeout=120)
    finally:
        frontend.close()
    assert "nbest" not in d1
    hyps = d3["nbest"]
    assert 1 <= len(hyps) <= 3
    assert hyps[0]["ids"] == d3["ids"] and hyps[0]["text"] == d3["text"]
    scores = [h["score"] for h in hyps]
    assert scores == sorted(scores, reverse=True)


def test_streaming_sessions_over_tcp(tmp_path):
    """Live streaming over the daemon protocol: two interleaved sessions
    produce exactly what their standalone streaming sessions produce, a
    third open is refused while both slots are busy, flushing frees the
    slot, and unknown sessions error."""
    import srf_tpu.serve_daemon as sd
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer

    argv, base = _trained_srf_args()
    logger = Logger(name="daemon-stream", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args

    ready = threading.Event()
    thread = threading.Thread(
        target=sd.serve,
        kwargs=dict(config=config, host="127.0.0.1", port=0, max_batch=2,
                    max_wait_ms=5, logger=logger, ready_event=ready,
                    stream_slots=2, stream_chunk=4),
        daemon=True,
    )
    thread.start()
    assert ready.wait(timeout=300)
    server = ready.server
    port = server.server_address[1]
    try:
        rec = Recognizer(config, logger)
        feats = [np.load(base / ("u%d.None.npy" % i)) for i in range(2)]
        want = []
        for f in feats:
            session = rec.streaming_session(chunk=4)
            want.append(session.push(f) + session.flush())

        s0 = sd.stream_open("127.0.0.1", port)
        s1 = sd.stream_open("127.0.0.1", port)
        with pytest.raises(RuntimeError, match="no free streaming slots"):
            sd.stream_open("127.0.0.1", port)
        got = {s0: [], s1: []}
        # interleave pushes in small chunks across the two sessions
        for lo in range(0, max(f.shape[0] for f in feats), 11):
            for sid, f in ((s0, feats[0]), (s1, feats[1])):
                if lo < f.shape[0]:
                    ids, _ = sd.stream_push(
                        "127.0.0.1", port, sid, f[lo: lo + 11],
                        corpus="wsj",
                    )
                    got[sid].extend(ids)
        for sid, i in ((s0, 0), (s1, 1)):
            body = sd.stream_flush("127.0.0.1", port, sid, corpus="wsj")
            assert body["complete"] is False
            got[sid].extend(body["ids"])
            assert got[sid] == want[i], (i, got[sid], want[i])
        # both slots free again; stale ids rejected
        s2 = sd.stream_open("127.0.0.1", port)
        with pytest.raises(RuntimeError, match="unknown streaming"):
            sd.stream_flush("127.0.0.1", port, s0)
        sd.stream_flush("127.0.0.1", port, s2)
    finally:
        server.shutdown()
        thread.join(timeout=30)


def _trained_srf_args():
    """Train the tiny SRF checkpoint once per process (mirrors the
    trained_srf fixture, callable outside its module)."""
    global _SRF_ARGS
    try:
        return _SRF_ARGS
    except NameError:
        pass
    import tempfile
    from pathlib import Path

    base = Path(tempfile.mkdtemp(prefix="daemon_srf_"))
    import json as _json

    from tests.test_serve import FEAT_DIM, VOCAB_TOKENS

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
                f.write(_json.dumps(u) + "\n")
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
    from srf_tpu.config import Logger as _Logger
    from srf_tpu.config import ParseOption as _ParseOption
    from srf_tpu.config.constants import Tag
    from srf_tpu.data.writer import convert_to_tfrecord
    from srf_tpu import trainer_sr

    logger = _Logger(name="daemon-srf", level=_Logger.INFO).logger
    config = _ParseOption(argv, logger, is_print_opts=False).args
    for tag in (Tag.TRAIN, Tag.VALID, Tag.TEST):
        convert_to_tfrecord(logger, config, tag, None)
    trainer_sr.main(argv + ["--train-max-epoch=1"])
    _SRF_ARGS = (argv, base)
    return _SRF_ARGS


def test_http_transcribe_long(tmp_path):
    """POST /v1/transcribe_long returns silence-segmented, timestamped
    segments matching Recognizer.transcribe_long directly."""
    import json as _json
    import urllib.request

    import srf_tpu.serve_daemon as sd
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.serve import Recognizer

    argv, base = _trained_srf_args()
    logger = Logger(name="daemon-long", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args

    ready = threading.Event()
    thread = threading.Thread(
        target=sd.serve,
        kwargs=dict(config=config, host="127.0.0.1", port=0, http_port=0,
                    max_batch=2, max_wait_ms=5, logger=logger,
                    ready_event=ready),
        daemon=True,
    )
    thread.start()
    assert ready.wait(timeout=300)
    server, http_server = ready.server, ready.http_server
    hport = http_server.server_address[1]
    try:
        rec = Recognizer(config, logger)
        feats = np.load(base / "u2.None.npy")
        want = rec.transcribe_long(feats, corpus="wsj", beam_width=4,
                                   endpoint_blanks=3)
        body = _json.dumps({
            "feats": feats.tolist(), "corpus": "wsj",
            "endpoint_blanks": 3,
        }).encode()
        req = urllib.request.Request(
            "http://127.0.0.1:%d/v1/transcribe_long" % hport, data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            got = _json.loads(resp.read().decode())["segments"]
        assert got == want
    finally:
        server.shutdown()
        thread.join(timeout=30)
