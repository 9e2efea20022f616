"""Dev probe: per-step cost anatomy of the batched device beam.

The serving beam saturated ~275 utt/s past batch 384 (r4, STATUS.md);
this probe's ablations located the cost (r5, BENCH_NOTES "beam per-step
anatomy"): the scan body is bounded by per-op overhead, not element
counts. Rows:

- baseline / approx   the shipped compact path, exact vs approx_max_k
- full .. bare        step-shaped ablation scans stripping one piece at
                      a time (merge board, selection gathers, tape,
                      freeze) — TIMING brackets only, semantics differ
- topk_only           candidate build + top-k alone (the scan floor
                      with exact selection)

All variants are value-fetch fenced and return CHECKSUMS, never tapes:
block_until_ready does not fence on the remote backend, and fetching a
[B, T, W] tape would time the host link, not the chip.

Run: python tools_dev/bench_beam_step.py [--batch 512] [--frames 200]
         [--vocab 63] [--beam 100] [--iters 3]
"""

import argparse
import functools
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

    def fence(out):
        for x in jax.tree.leaves(out):
            np.asarray(x)  # block_until_ready does not fence on axon
        return out

    timed("baseline", lambda: fence(cbj._beam_scan_batch_compact(
        logits, lengths, args.beam, args.vocab - 1)))
    timed("approx", lambda: fence(cbj._beam_scan_batch_compact(
        logits, lengths, args.beam, args.vocab - 1, topk_approx=True)))

    # ---- ablation scans: strip one piece at a time from a body shaped
    # like the real one, to locate the per-step cost. Semantics differ
    # (no merge etc.) — these are TIMING brackets only.
    def make_scan(with_merge=True, with_select=True, with_tape=True,
                  with_freeze=True, topk="exact"):
        W, K = args.beam, args.vocab
        NEG = cbj.NEG
        M, MI = cbj._HASH_MUL, cbj._HASH_MUL_INV
        syms_all = jnp.arange(K, dtype=jnp.int32)
        blank_id = K - 1

        @jax.jit
        def run(logits, lengths):
            logp = jax.nn.log_softmax(logits, axis=-1)

            def one(lp_seq, n):
                def step(state, inputs):
                    lp, t = inputs
                    pb, pnb, last, hsh = (state["pb"], state["pnb"],
                                          state["last"], state["hash"])
                    p_tot = jnp.logaddexp(jnp.maximum(pb, NEG),
                                          jnp.maximum(pnb, NEG))
                    p_tot = jnp.where((pb <= NEG) & (pnb <= NEG), NEG, p_tot)
                    lp_blank = lp[blank_id]
                    last_safe = jnp.maximum(last, 0)
                    lp_last = jnp.where(last >= 0, lp[last_safe], NEG)
                    stay_pb = jnp.where(p_tot <= NEG, NEG, p_tot + lp_blank)
                    stay_pnb = jnp.where(pnb <= NEG, NEG, pnb + lp_last)
                    is_rep = syms_all[None, :] == last[:, None]
                    base = jnp.where(is_rep, pb[:, None], p_tot[:, None])
                    ext_pnb = jnp.where(base <= NEG, NEG, base + lp[None, :])
                    ext_pnb = jnp.where(
                        syms_all[None, :] == blank_id, NEG, ext_pnb)
                    dead = jnp.zeros((W, K), bool)
                    if with_merge:
                        parent_hash = (
                            hsh - (last_safe.astype(jnp.uint32) + 1)) * MI
                        rep_ji = last[:, None] == last[None, :]
                        base_ji = jnp.where(rep_ji, pb[None, :],
                                            p_tot[None, :])
                        match = ((parent_hash[:, None] == hsh[None, :])
                                 & (last[:, None] >= 0) & (base_ji > NEG))
                        has_match = jnp.any(match, axis=1)
                        merged_in = jnp.max(
                            jnp.where(match, base_ji + lp_last[:, None], NEG),
                            axis=1)
                        stay_pnb = jnp.where(
                            has_match,
                            jnp.logaddexp(jnp.maximum(stay_pnb, NEG),
                                          merged_in), stay_pnb)
                        onehot = (syms_all[None, :] == last_safe[:, None]
                                  ).astype(jnp.float32)
                        dead = (match.astype(jnp.float32).T @ onehot) > 0.5
                    stay_tot = jnp.logaddexp(jnp.maximum(stay_pb, NEG),
                                             jnp.maximum(stay_pnb, NEG))
                    rank_ext = jnp.where(dead | (ext_pnb <= NEG), NEG,
                                         ext_pnb)
                    scores = jnp.concatenate(
                        [stay_tot, rank_ext.reshape(-1)])
                    if topk == "exact":
                        _, top_idx = jax.lax.top_k(scores, W)
                    else:
                        _, top_idx = jax.lax.approx_max_k(scores, W)
                    is_stay = top_idx < W
                    ext_idx = jnp.maximum(top_idx - W, 0)
                    ext_beam = ext_idx // K
                    ext_sym = (ext_idx % K).astype(jnp.int32)
                    if with_select:
                        parent_i = jnp.where(is_stay, top_idx, ext_beam)
                        pb_p = pb[parent_i]
                        pnb_p = pnb[parent_i]
                        hash_p = hsh[parent_i]
                        last_p = last[parent_i]
                        ptot_p = jnp.logaddexp(jnp.maximum(pb_p, NEG),
                                               jnp.maximum(pnb_p, NEG))
                        st_pb = ptot_p + lp_blank
                        ex_base = jnp.where(ext_sym == last_p, pb_p, ptot_p)
                        ex_pnb = ex_base + lp[ext_sym]
                        ex_hash = hash_p * M + (
                            ext_sym.astype(jnp.uint32) + 1)
                        sel = {
                            "hash": jnp.where(is_stay, hash_p, ex_hash),
                            "pb": jnp.where(is_stay, st_pb, NEG),
                            "pnb": jnp.where(is_stay, pnb_p, ex_pnb),
                            "last": jnp.where(is_stay, last_p, ext_sym),
                        }
                        parent = jnp.where(is_stay, parent_i,
                                           ext_beam).astype(jnp.int32)
                        sym = jnp.where(is_stay, -1, ext_sym)
                    else:
                        sel = {
                            "hash": hsh, "pb": stay_pb, "pnb": stay_pnb,
                            "last": jnp.where(is_stay, last, ext_sym),
                        }
                        parent = ext_beam.astype(jnp.int32)
                        sym = ext_sym
                    if with_freeze:
                        active = (t >= 0) & (t < n)
                        sel = jax.tree.map(
                            lambda a, b: jnp.where(active, a, b), sel, state)
                    if with_tape:
                        rec = (parent.astype(jnp.int16),
                               sym.astype(jnp.int16))
                    else:
                        rec = None
                    return sel, rec

                init = {
                    "hash": jnp.uint32(17) + jnp.arange(W, dtype=jnp.uint32)
                    * jnp.uint32(2654435761),
                    "pb": jnp.where(jnp.arange(W) == 0, 0.0, NEG),
                    "pnb": jnp.full((W,), NEG),
                    "last": jnp.full((W,), -1, jnp.int32),
                }
                ts = jnp.arange(lp_seq.shape[0])
                final, tape = jax.lax.scan(step, init, (lp_seq, ts))
                # CHECKSUM outputs: fetching a [T, W] tape per utterance
                # would time the host link, not the chip (the product
                # path backtraces on device and never fetches tapes)
                out = jnp.maximum(final["pnb"], NEG).sum()
                if tape is not None:
                    out = out + sum(
                        t.astype(jnp.int32).sum() for t in tape
                    ).astype(jnp.float32)
                return out

            return jax.vmap(one)(logp, lengths)

        return run

    for tag, kw in [
        ("full", {}),
        ("no_merge", dict(with_merge=False)),
        ("no_select", dict(with_select=False)),
        ("no_tape", dict(with_tape=False)),
        ("no_freeze", dict(with_freeze=False)),
        ("bare", dict(with_merge=False, with_select=False,
                      with_tape=False, with_freeze=False)),
        ("full_approx", dict(topk="approx")),
    ]:
        timed(tag, functools.partial(
            lambda f: fence(f(logits, lengths)), make_scan(**kw)))

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
            return tape.astype(jnp.int32).sum()  # checksum, not a fetch

        return jax.vmap(one)(logp, lengths)

    timed("topk_only", lambda: fence(topk_only(logits, lengths)))


if __name__ == "__main__":
    main()
