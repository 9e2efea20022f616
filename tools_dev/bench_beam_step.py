"""Dev probe: per-step cost anatomy of the batched device beam.

The serving beam saturates ~275 utt/s past batch 384 (r4, STATUS.md) —
compute-bound in the per-step body. This isolates the beam scan from the
model forward (bench.py's serving rows time fwd+decode together) and
times variants that bracket the suspects:

- baseline         the shipped exact path
- approx           lax.approx_max_k selection (bounds the top-k share)
- topk_only        a scan with ONLY the candidate build + top-k (no merge
                   fold, no dead-mask scatter) — bounds the merge share

Run: python tools_dev/bench_beam_step.py [--batch 512] [--frames 200]
         [--vocab 63] [--beam 100] [--iters 3]
"""

import argparse
import time

import numpy as np

import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--frames", type=int, default=200)
    parser.add_argument("--vocab", type=int, default=63)
    parser.add_argument("--beam", type=int, default=100)
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from srf_tpu.ops import ctc_beam_jax as cbj
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    host = np.random.RandomState(0)
    logits = jnp.asarray(
        host.randn(args.batch, args.frames, args.vocab), jnp.float32)
    lengths = jnp.full((args.batch,), args.frames, jnp.int32)
    audio_secs = args.batch * args.frames * 4 * 0.01  # in_len_div=4

    def timed(tag, fn):
        out = fn()
        jax.block_until_ready(out)
        start = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
            jax.block_until_ready(out)
        dt = (time.perf_counter() - start) / args.iters
        print("%-12s %8.1f ms  %8.1f utt/s  %9.0fx RT"
              % (tag, dt * 1e3, args.batch / dt, audio_secs / dt),
              flush=True)
        return dt

    timed("baseline", lambda: cbj._beam_scan_batch_compact(
        logits, lengths, args.beam, args.vocab - 1))
    timed("approx", lambda: cbj._beam_scan_batch_compact(
        logits, lengths, args.beam, args.vocab - 1, topk_approx=True))

    # top-k-only scan: candidate build + selection, none of the merge
    # machinery — brackets how much the merge/dead-mask costs
    W, K = args.beam, args.vocab
    NEG = cbj.NEG

    @jax.jit
    def topk_only(logits, lengths):
        logp = jax.nn.log_softmax(logits, axis=-1)

        def one(lp_seq, n):
            def step(state, lp):
                pb, pnb, last = state
                p_tot = jnp.logaddexp(pb, pnb)
                stay = p_tot + lp[-1]
                ext = p_tot[:, None] + lp[None, :]
                scores = jnp.concatenate([stay, ext.reshape(-1)])
                _, idx = jax.lax.top_k(scores, W)
                is_stay = idx < W
                ei = jnp.maximum(idx - W, 0)
                new_last = jnp.where(is_stay, last, (ei % K))
                new_pb = jnp.where(is_stay, pb[jnp.where(is_stay, idx, 0)], NEG)
                new_pnb = jnp.where(
                    is_stay, pnb[jnp.where(is_stay, idx, 0)],
                    ext.reshape(-1)[ei])
                return (new_pb, new_pnb, new_last), new_last.astype(jnp.int16)

            init = (jnp.where(jnp.arange(W) == 0, 0.0, NEG),
                    jnp.full((W,), NEG), jnp.full((W,), -1, jnp.int32))
            _, tape = jax.lax.scan(step, init, lp_seq)
            return tape

        return jax.vmap(one)(logp, lengths)

    timed("topk_only", lambda: topk_only(logits, lengths))


if __name__ == "__main__":
    main()
