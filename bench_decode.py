"""Benchmark: decode real-time factor (RTF) of the canonical SRF-TIMIT model.

Measures forward + CTC beam search per utterance at batch 1 (the reference's
decode protocol: beam 100, top-1, batch 1 — egs/conf/timit.conf:10) for
host-C++ and on-device beam decoders, plus greedy. Prints one JSON line per
decoder: audio-seconds processed per wall-second (RTF > 1 is faster than
real time; frames are 10 ms).

Usage:  python bench_decode.py [--frames 800] [--utts 5]
"""

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=800)
    parser.add_argument("--utts", type=int, default=5)
    parser.add_argument("--beam", type=int, default=100)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.ops.ctc_beam_jax import ctc_beam_search_jax
    from srf_tpu.ops.ctc_decode import beam_search_batch, greedy_decode_jit

    model = SequenceRouter(
        feat_dim=123, class_n=63, enc_num=7, caps_primary_num=60,
        caps_primary_dim=8, caps_conv_num=30, caps_conv_dim=8,
        caps_class_dim=8, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=64, caps_type="naive",
    )
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    feats = jnp.asarray(host.randn(1, args.frames, 123), jnp.float32)
    lens = jnp.asarray([args.frames], jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, feats, lens, False)

    fwd = jax.jit(lambda f, l: model.apply(variables, f, l, False))
    logits = np.asarray(fwd(feats, lens))  # warm compile
    dec_len = args.frames // 4
    audio_secs = args.frames * 0.01

    def run(tag, decode_fn, warm=True):
        if warm:
            decode_fn()
        start = time.perf_counter()
        for _ in range(args.utts):
            logits_np = np.asarray(fwd(feats, lens))
            decode_fn(logits_np)
        elapsed = time.perf_counter() - start
        rtf = audio_secs * args.utts / elapsed
        print(json.dumps({
            "metric": "srf_timit_decode_rtf_%s" % tag,
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": 1.0,
        }), flush=True)

    run("greedy",
        lambda l=logits: np.asarray(
            greedy_decode_jit(jnp.asarray(l), jnp.asarray([dec_len]))[0]))
    run("beam_device",
        lambda l=logits: ctc_beam_search_jax(l[0], dec_len, args.beam))
    run("beam_host",
        lambda l=logits: beam_search_batch(l, [dec_len], args.beam))

    # streaming: chunked inference latency (greedy, 320 ms chunks)
    from srf_tpu.streaming import StreamingTranscriber

    session = StreamingTranscriber(model, variables, blank_id=62, chunk=8)
    raw = np.asarray(feats[0])
    chunk_raw = 8 * 4
    session.push(raw[:chunk_raw]); session.flush()  # warm compiles
    session.reset()
    start = time.perf_counter()
    lat_max = 0.0
    for lo in range(0, args.frames, chunk_raw):
        t0 = time.perf_counter()
        session.push(raw[lo : lo + chunk_raw])
        lat_max = max(lat_max, time.perf_counter() - t0)
    session.flush()
    elapsed = time.perf_counter() - start
    print(json.dumps({
        "metric": "srf_timit_stream_rtf_greedy",
        "value": round(audio_secs / elapsed, 2),
        "unit": "x_realtime",
        "vs_baseline": 1.0,
    }), flush=True)
    print(json.dumps({
        "metric": "srf_timit_stream_chunk_latency",
        "value": round(lat_max * 1e3, 2),
        "unit": "ms_per_320ms_chunk",
        "vs_baseline": 1.0,
    }), flush=True)


if __name__ == "__main__":
    main()
