"""Dev bench: host-side cost of a LONG-LIVED streaming session stays flat.

Before the r3 hardening, two per-tick host costs grew with stream length:
the ``logits`` property re-concatenated the full history each access, and
``_raw`` was re-copied (and retained) in full on every push — making a
live stream quadratic on the host. This bench pushes a long synthetic
stream and reports per-push wall time at the start vs the end, plus the
retained raw-buffer size. Flat = fixed.

Run: python tools_dev/bench_stream_long.py [--minutes 10] [--chunk 8]
(CPU by default: the measurement is host-side bookkeeping, not device.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--minutes", type=float, default=10.0,
                        help="simulated audio minutes (100 frames/s)")
    parser.add_argument("--chunk", type=int, default=8)
    parser.add_argument("--push", type=int, default=40,
                        help="frames per push (0.4 s of audio)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.streaming import StreamingTranscriber

    FEAT, VOCAB = 12, 6
    model = SequenceRouter(
        feat_dim=FEAT, class_n=VOCAB + 1, enc_num=3, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4,
        caps_class_dim=4, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=8, caps_type="naive",
    )
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 32, FEAT)), jnp.array([32]), False,
    )
    s = StreamingTranscriber(model, variables, blank_id=VOCAB + 1,
                             chunk=args.chunk, beam_width=4)

    total_frames = int(args.minutes * 60 * 100)
    n_pushes = total_frames // args.push
    rng = np.random.RandomState(0)
    frames = rng.randn(args.push, FEAT).astype(np.float32)

    window = max(50, n_pushes // 20)
    t_first = t_last = None
    t0 = time.time()
    for i in range(n_pushes):
        t = time.perf_counter()
        s.push(frames)
        dt = time.perf_counter() - t
        if i == window:
            t_first = dt
        if i == n_pushes - 1:
            t_last = dt
    wall = time.time() - t0
    print(
        "stream %.1f min (%d frames, %d pushes): wall %.1fs, "
        "push[%d]=%.2f ms, push[last]=%.2f ms (ratio %.2fx), "
        "raw buffer retained %d rows (bound %d)"
        % (
            args.minutes, total_frames, n_pushes, wall,
            window, 1e3 * t_first, 1e3 * t_last,
            t_last / max(t_first, 1e-9),
            s._raw.shape[0], s.win + s.K * s.div + s.lmargin,
        )
    )


if __name__ == "__main__":
    main()
