"""Dev probe: can XLA fuse the int8 weight read into the matmul?

VERDICT r3 item 8: the serving int8 path (ops/quant.py) dequantizes
inside the jitted forward; r3 measured it speed-neutral because XLA
materializes the dequantized f32 weights. Candidate fixes probed here on
a Dense-stack proxy (STF-WSJ-ish shapes) at serving batch sizes:

  f32        x @ W                                  (baseline)
  deq_pre    x @ (q.astype(f32) * scale)            (current ops/quant.py)
  deq_epi    (x @ q.astype(f32)) * scale            (per-output-channel
             scale commutes with the contraction; the convert becomes a
             bare elementwise op XLA may fuse into the dot operand)
  bf16_w     x @ W.astype(bf16).astype(f32)         (2x footprint path)

Run: python tools_dev/probe_int8_fuse.py [--layers 20] [--d 256 --ff 1488]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--layers", type=int, default=20)
    parser.add_argument("--d", type=int, default=256)
    parser.add_argument("--ff", type=int, default=1488)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--seq", type=int, default=600)
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    L, D, F = args.layers, args.d, args.ff
    w1 = [jnp.asarray(rng.randn(D, F), jnp.float32) * 0.05 for _ in range(L)]
    w2 = [jnp.asarray(rng.randn(F, D), jnp.float32) * 0.05 for _ in range(L)]

    def quant(w):
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
        q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        return q, s

    q1 = [quant(w) for w in w1]
    q2 = [quant(w) for w in w2]
    x0 = jnp.asarray(rng.randn(args.batch, args.seq, D), jnp.float32)

    def run_f32(x):
        for a, b in zip(w1, w2):
            x = jnp.maximum(x @ a, 0.0) @ b
        return x

    def run_deq_pre(x):
        for (qa, sa), (qb, sb) in zip(q1, q2):
            x = jnp.maximum(x @ (qa.astype(jnp.float32) * sa), 0.0) @ (
                qb.astype(jnp.float32) * sb)
        return x

    def run_deq_epi(x):
        for (qa, sa), (qb, sb) in zip(q1, q2):
            x = jnp.maximum((x @ qa.astype(jnp.float32)) * sa, 0.0)
            x = (x @ qb.astype(jnp.float32)) * sb
        return x

    b1 = [w.astype(jnp.bfloat16) for w in w1]
    b2 = [w.astype(jnp.bfloat16) for w in w2]

    def run_bf16w(x):
        for a, b in zip(b1, b2):
            x = jnp.maximum(x @ a.astype(jnp.float32), 0.0) @ b.astype(
                jnp.float32)
        return x

    for tag, fn in (("f32", run_f32), ("deq_pre", run_deq_pre),
                    ("deq_epi", run_deq_epi), ("bf16_w", run_bf16w)):
        jf = jax.jit(fn)
        out = jf(x0)
        float(jax.device_get(out.sum()))  # sync (axon: not block_until_ready)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jf(x0)
        float(jax.device_get(out.sum()))
        dt = (time.perf_counter() - t0) / args.iters
        print("%-8s %8.3f ms  (batch %d, %dx[%d->%d->%d])"
              % (tag, dt * 1e3, args.batch, L, D, F, D), flush=True)


if __name__ == "__main__":
    main()
