"""Dev bench: N concurrent streaming sessions (StreamingPool) on the chip.

Aggregate realtime factor for N live streams advanced by one fused
dispatch per tick, vs N x the single-session cost.
Run: python tools_dev/bench_stream_pool.py [--slots 8] [--beam 0]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.streaming import StreamingPool

    parser = argparse.ArgumentParser()
    parser.add_argument("--slots", type=int, default=8)
    parser.add_argument("--chunk", type=int, default=16)
    parser.add_argument("--beam", type=int, default=0)
    parser.add_argument("--frames", type=int, default=800)
    args = parser.parse_args()

    model = SequenceRouter(
        feat_dim=123, class_n=63, enc_num=7, caps_primary_num=60,
        caps_primary_dim=8, caps_conv_num=30, caps_conv_dim=8,
        caps_class_dim=8, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=64, caps_type="naive",
    )
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.asarray(host.randn(1, 64, 123), jnp.float32),
        jnp.asarray([64]), False,
    )
    beam = args.beam if args.beam > 0 else None
    utts = [
        host.randn(args.frames, 123).astype(np.float32)
        for _ in range(args.slots)
    ]
    chunk_raw = args.chunk * 4

    pool = StreamingPool(model, variables, blank_id=62, slots=args.slots,
                         chunk=args.chunk, beam_width=beam)

    def run_pass():
        lat = []
        start = time.perf_counter()
        for lo in range(0, args.frames, chunk_raw):
            for i in range(args.slots):
                pool.push(i, utts[i][lo : lo + chunk_raw])
            t0 = time.perf_counter()
            pool.step()
            lat.append(time.perf_counter() - t0)
        for i in range(args.slots):
            pool.flush(i)
        return lat, time.perf_counter() - start

    run_pass()  # warm pass: compiles + the tunnel's per-shape setup
    lat, total = run_pass()
    audio = args.slots * args.frames * 0.01
    print(
        "%s slots=%d chunk=%d: mean tick %6.1f ms, median %6.1f ms, "
        "max %6.1f ms, aggregate RTF %6.2fx (%.2fx per stream)" % (
            "beam-%d" % beam if beam else "greedy", args.slots, args.chunk,
            float(np.mean(lat)) * 1e3, float(np.median(lat)) * 1e3,
            max(lat) * 1e3, audio / total, audio / total / args.slots,
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
