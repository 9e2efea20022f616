"""Dev bench: BATCHED serving decode throughput (canonical SRF-TIMIT).

The reference's decode protocol is batch 1 (egs/conf/timit.conf:10 +
tfsr/helper/data_helper.py:54-60) — the right parity measurement, already
covered by bench_decode.py. A TPU serving deployment batches: this bench
measures forward + decode throughput (utt/s/chip and x-realtime) when N
utterances decode in one device dispatch, for greedy and for the on-device
beam (ops/ctc_beam_jax.py ctc_beam_search_batch_jax) and the host C++ beam.

Run: python tools_dev/bench_serve_batch.py [--batch 16] [--frames 800]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--frames", type=int, default=800)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--beam", type=int, default=100)
    parser.add_argument("--impl", default="",
                        help="comma filter: greedy,beam_device,"
                             "beam_host_cpp (default all)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.ops.ctc_beam_jax import ctc_beam_search_batch_jax
    from srf_tpu.ops.ctc_decode import beam_search_batch, greedy_decode_jit

    model = SequenceRouter(
        feat_dim=123, class_n=63, enc_num=7, caps_primary_num=60,
        caps_primary_dim=8, caps_conv_num=30, caps_conv_dim=8,
        caps_class_dim=8, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=64, caps_type="naive",
    )
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    B, T = args.batch, args.frames
    feats = jnp.asarray(host.randn(B, T, 123), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng}, feats[:1], lens[:1], False
    )
    fwd = jax.jit(lambda f, l: model.apply(variables, f, l, False))
    dec_len = T // 4
    dec_lens = np.full((B,), dec_len, np.int32)
    audio_secs = T * 0.01 * B

    def run(tag, decode_fn):
        logits = fwd(feats, lens)
        decode_fn(logits)  # warm/compile
        start = time.perf_counter()
        for _ in range(args.iters):
            logits = fwd(feats, lens)
            decode_fn(logits)
        elapsed = time.perf_counter() - start
        print(json.dumps({
            "metric": "srf_timit_serve_%s" % tag,
            "batch": B,
            "utt_per_s": round(B * args.iters / elapsed, 1),
            "x_realtime": round(audio_secs * args.iters / elapsed, 1),
        }), flush=True)

    impls = (args.impl.split(",") if args.impl
             else ["greedy", "beam_device", "beam_host_cpp"])
    if "greedy" in impls:
        run("greedy", lambda lg: np.asarray(
            greedy_decode_jit(lg, jnp.asarray(dec_lens))[0]))
    if "beam_device" in impls:
        run("beam_device", lambda lg: ctc_beam_search_batch_jax(
            lg, dec_lens, args.beam))
    if "beam_host_cpp" in impls:
        run("beam_host_cpp", lambda lg: beam_search_batch(
            np.asarray(lg), list(dec_lens), args.beam))


if __name__ == "__main__":
    main()
