"""Contended serving latency: daemon stream ticks under mixed load.

VERDICT r3 item 6 (second half): the r3 streamed-beam numbers were
UNCONTENDED. This measures per-push stream latency (p50/p95/p99) at
FULL stream slots with mixed chunk sizes, first alone and then while
batch transcribe requests co-run through the same daemon — the real
multi-tenant regime (the StreamingPool advances all busy sessions in
one fused dispatch; batch requests interleave on the same chip).

Setup: canonical SRF-TIMIT model (random init — decode latency does not
depend on the weight values), daemon in-process (sd.serve thread),
8 stream slots, TCP clients in threads.

Run: python tools_dev/bench_daemon_contended.py [--slots 8] [--secs 20]
         [--beam 0] [--batch-clients 2]
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, ".")

import numpy as np


def build_checkpoint(base):
    """Canonical SRF-TIMIT config + a random-init checkpoint the daemon
    can serve (no training: latency is weight-value-independent)."""
    import jax

    from srf_tpu import trainer_sr
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.models.registry import build_model
    from srf_tpu.train.optimizer import get_optimizer
    from srf_tpu.utils.checkpoint import CheckpointManager

    vocab = os.path.join(base, "synth.vocab")
    with open(vocab, "w") as f:
        f.write("\n".join(
            ["<PADDING_SYMBOL>"] + ["p%02d" % i for i in range(1, 60)]
            + ["$", "@"]) + "\n")
    argv = [
        "prog", "--path-base=%s" % base, "--path-vocab=synth.vocab",
        "--feat-dim=123", "--feat-type=None",
        "--path-ckpt=%s/ckpt" % base,
        "--model-type=srf", "--model-caps-type=naive",
        "--model-caps-context=True", "--model-encoder-num=7",
        "--model-caps-primary-num=60", "--model-caps-primary-dim=8",
        "--model-caps-convolution-num=30", "--model-caps-convolution-dim=8",
        "--model-caps-class-dim=8", "--model-caps-iter=1",
        "--model-caps-window-lpad=1", "--model-caps-window-rpad=1",
        "--model-conv-layer-num=2", "--model-conv-filter-num=64",
        "--train-opti-type=adam", "--train-lr-param-k=0.01",
        "--train-batch-dynamic=False", "--train-batch-size=2",
        "--decoding-beam-width=4",
    ]
    from srf_tpu.utils.vocab import get_file_path, load_vocab

    logger = Logger(name="bench-daemon", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    # trainer_sr.py:198-201: class count = dec_in_dim + 1 (appended blank)
    _, _, dec_in_dim, _ = load_vocab(
        get_file_path(config.path_base, config.path_vocab), logger)
    model, _ = build_model(config, dec_in_dim + 1, logger)
    tx, _ = get_optimizer(config)
    state = trainer_sr.state_template(model, config, tx,
                                      jax.random.PRNGKey(0))
    mgr = CheckpointManager(os.path.join(base, "ckpt"))
    mgr.save(1, trainer_sr.state_to_tree(state))
    mgr.close()
    return config, logger


def percentiles(lat):
    arr = np.asarray(sorted(lat))
    return {
        "n": int(arr.size),
        "p50_ms": round(float(np.percentile(arr, 50)) * 1e3, 1),
        "p95_ms": round(float(np.percentile(arr, 95)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(arr, 99)) * 1e3, 1),
        "mean_ms": round(float(arr.mean()) * 1e3, 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--slots", type=int, default=8)
    parser.add_argument("--secs", type=float, default=20.0)
    parser.add_argument("--beam", type=int, default=0,
                        help="0 = greedy streams; >1 = streamed beam")
    parser.add_argument("--batch-clients", type=int, default=2)
    parser.add_argument("--batch-utt-frames", type=int, default=800)
    args = parser.parse_args()

    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import srf_tpu.serve_daemon as sd

    base = tempfile.mkdtemp(prefix="bench_daemon_")
    config, logger = build_checkpoint(base)

    ready = threading.Event()
    thread = threading.Thread(
        target=sd.serve,
        kwargs=dict(config=config, host="127.0.0.1", port=0, max_batch=16,
                    max_wait_ms=5, logger=logger, ready_event=ready,
                    stream_slots=args.slots, stream_chunk=16,
                    stream_beam=args.beam),
        daemon=True,
    )
    thread.start()
    assert ready.wait(timeout=600)
    server = ready.server
    port = server.server_address[1]
    host = "127.0.0.1"
    rng = np.random.RandomState(0)

    def stream_client(slot_idx, stop, lats, chunk):
        sid = sd.stream_open(host, port)
        feats = rng.randn(4096, 123).astype(np.float32)
        lo = 0
        warm = 0
        while not stop.is_set():
            t0 = time.perf_counter()
            sd.stream_push(host, port, sid, feats[lo:lo + chunk])
            dt = time.perf_counter() - t0
            warm += 1
            if warm > 3:  # skip compile/cold pushes
                lats.append(dt)
            lo = (lo + chunk) % 3000
        sd.stream_flush(host, port, sid)

    def run_phase(tag, contended):
        stop = threading.Event()
        lats = [[] for _ in range(args.slots)]
        # mixed chunk sizes across the full slots
        chunks = [(8, 16, 32)[i % 3] for i in range(args.slots)]
        threads = [
            threading.Thread(target=stream_client,
                             args=(i, stop, lats[i], chunks[i]))
            for i in range(args.slots)
        ]
        batch_stats = {"requests": 0}
        batch_threads = []
        if contended:
            def batch_client():
                feats = rng.randn(
                    args.batch_utt_frames, 123).astype(np.float32)
                while not stop.is_set():
                    sd.request(host, port, feats)
                    batch_stats["requests"] += 1

            batch_threads = [
                threading.Thread(target=batch_client)
                for _ in range(args.batch_clients)
            ]
        for t in threads + batch_threads:
            t.start()
        time.sleep(args.secs)
        stop.set()
        for t in threads + batch_threads:
            t.join(timeout=120)
        merged = [x for slot in lats for x in slot]
        per_chunk = {}
        for i, c in enumerate(chunks):
            per_chunk.setdefault(c, []).extend(lats[i])
        row = {"phase": tag, "slots": args.slots, "beam": args.beam,
               **percentiles(merged)}
        for c in sorted(per_chunk):
            row["chunk%d" % c] = percentiles(per_chunk[c])
        if contended:
            row["batch_requests"] = batch_stats["requests"]
            row["batch_utt_per_s"] = round(
                batch_stats["requests"] / args.secs, 1)
        print(json.dumps(row), flush=True)

    # warm the stream program(s) once before timing phases
    warm_sid = sd.stream_open(host, port)
    sd.stream_push(host, port, warm_sid,
                   rng.randn(32, 123).astype(np.float32))
    sd.stream_flush(host, port, warm_sid)
    # warm the batch program too (it shares phase 2)
    sd.request(host, port, rng.randn(args.batch_utt_frames, 123)
               .astype(np.float32))

    run_phase("uncontended", contended=False)
    run_phase("contended", contended=True)
    server.shutdown()


if __name__ == "__main__":
    main()
