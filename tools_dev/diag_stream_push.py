"""Diagnose the streamed-beam push-latency spike (VERDICT r4 #4).

BENCH_r04 streaming_beam_chunk16: mean push 77.5 ms, max 485.9 ms (6x),
RTF 3.82. This instruments one streaming session per push:

- tunnel RTT floor: time to fetch a ready 1-element device array,
- per-push phase split: _advance (model step dispatch + blocking logits
  fetch), greedy decode (host), _beam_advance (host slice + upload +
  beam dispatch),
- the per-push series, so the spike's position and phase are visible.

Run: python tools_dev/diag_stream_push.py [--frames 800] [--chunk 16]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=800)
    parser.add_argument("--chunk", type=int, default=16)
    parser.add_argument("--beam", type=int, default=100)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _canonical_model
    from srf_tpu.streaming import StreamingTranscriber

    # tunnel RTT floor: a ready scalar fetch, repeated
    x = jnp.zeros((1,), jnp.float32) + 1
    jax.block_until_ready(x)
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(x)
        rtts.append(time.perf_counter() - t0)
    print("ready-array fetch: p50 %.1f ms  min %.1f ms  max %.1f ms"
          % (1e3 * np.percentile(rtts, 50), 1e3 * np.min(rtts),
             1e3 * np.max(rtts)), flush=True)

    # a no-op dispatch + fetch (dispatch latency floor)
    f = jax.jit(lambda a: a + 1)
    f(x)
    disp = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(f(x))
        disp.append(time.perf_counter() - t0)
    print("dispatch+fetch:    p50 %.1f ms  min %.1f ms  max %.1f ms"
          % (1e3 * np.percentile(disp, 50), 1e3 * np.min(disp),
             1e3 * np.max(disp)), flush=True)

    model, variables = _canonical_model()
    host = np.random.RandomState(0)
    raw = host.randn(args.frames, 123).astype(np.float32)
    session = StreamingTranscriber(model, variables, blank_id=62,
                                   chunk=args.chunk, beam_width=args.beam)
    chunk_raw = args.chunk * 4
    session.push(raw[:chunk_raw])
    session.flush()
    session.reset()

    # monkey-patch phase timers around the internal stages
    phases = {"advance": [], "greedy": [], "beam": []}
    orig_advance = session._advance
    orig_decode = session._decode_available
    orig_beam = session._beam_advance

    def timed(name, fn):
        def wrapper(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            phases[name].append(time.perf_counter() - t0)
            return out
        return wrapper

    session._advance = timed("advance", orig_advance)
    session._decode_available = timed("greedy", orig_decode)
    session._beam_advance = timed("beam", orig_beam)

    lat = []
    t_start = time.perf_counter()
    for lo in range(0, args.frames, chunk_raw):
        t0 = time.perf_counter()
        session.push(raw[lo:lo + chunk_raw])
        lat.append(time.perf_counter() - t0)
    t_flush = time.perf_counter()
    session.flush()
    flush_s = time.perf_counter() - t_flush
    total = time.perf_counter() - t_start

    print("pushes: %d  mean %.1f ms  max %.1f ms  flush %.1f ms  RTF %.2f"
          % (len(lat), 1e3 * np.mean(lat), 1e3 * np.max(lat),
             1e3 * flush_s, args.frames * 0.01 / total), flush=True)
    for name, vals in phases.items():
        if vals:
            print("  %-8s n=%2d  mean %6.1f ms  max %6.1f ms  sum %7.1f ms"
                  % (name, len(vals), 1e3 * np.mean(vals),
                     1e3 * np.max(vals), 1e3 * np.sum(vals)), flush=True)
    print("per-push ms:", " ".join("%.0f" % (1e3 * v) for v in lat),
          flush=True)


if __name__ == "__main__":
    main()
