"""Dev bench: CTC forced-alignment throughput (canonical TIMIT shapes).

Measures the jitted trellis scan (ops/ctc_align.py) end to end including
the host backtrace, at serving-style batch sizes. Alignment is a data-prep
tool, so the number that matters is corpus-hours aligned per chip-hour.

Run: python tools_dev/bench_align.py [--batch 16] [--frames 200] [--labels 60]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--frames", type=int, default=200)  # post-subsample
    parser.add_argument("--labels", type=int, default=60)
    parser.add_argument("--vocab", type=int, default=63)
    parser.add_argument("--iters", type=int, default=5)
    args = parser.parse_args()

    from srf_tpu.ops.ctc_align import ctc_forced_align
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    B, T, L, V = args.batch, args.frames, args.labels, args.vocab
    logits = rng.randn(B, T, V).astype(np.float32)
    lens = np.full((B,), T, np.int32)
    labels = rng.randint(0, V - 1, size=(B, L)).astype(np.int32)
    lab_lens = np.full((B,), L, np.int32)

    ctc_forced_align(logits, lens, labels, lab_lens, blank_id=V - 1)  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = ctc_forced_align(logits, lens, labels, lab_lens,
                               blank_id=V - 1)
    dt = (time.perf_counter() - t0) / args.iters
    aligned = sum(1 for spans, _ in out if spans is not None)
    audio_s = B * T * 0.04  # 4x-subsampled 10 ms frames
    print({
        "metric": "ctc_forced_align",
        "batch": B, "frames": T, "labels": L,
        "ms_per_batch": round(dt * 1e3, 2),
        "utt_per_s": round(B / dt, 1),
        "x_realtime": round(audio_s / dt, 1),
        "aligned": aligned,
    })


if __name__ == "__main__":
    main()
