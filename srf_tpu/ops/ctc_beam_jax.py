"""On-device CTC beam search (jittable, static shapes).

TPU-native replacement for ``tf.nn.ctc_beam_search_decoder``
(reference: tfsr/trainer_sr.py:110-112): merged-prefix beam search with the
blank/non-blank probability split, expressed as a ``lax.scan`` over time so
the whole decode runs on-chip.

Prefix identity is a rolling hash (beams hold unique prefixes, so candidate
merging is hash-equality grouping): at each step the beam×(K+1) candidate
set (stay + extend) is sorted by hash, segment-wise log-sum-exp merges
duplicate prefixes, and top-k keeps the beam. Backpointers
(parent beam, appended symbol) are recorded per step; the best path is
reconstructed by a reverse walk (host-side, trivial).

Collision risk of the 32-bit rolling hash over <= beam*(K+1) candidates per
step is negligible for speech vocabularies (checked against the exact C++ /
Python decoders in tests).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30
_HASH_MUL = jnp.uint32(1000003)


def _segment_logsumexp(values, seg_id, num_segments):
    mx = jax.ops.segment_max(values, seg_id, num_segments=num_segments)
    mx_safe = jnp.where(mx <= NEG, 0.0, mx)
    sums = jax.ops.segment_sum(
        jnp.where(values <= NEG, 0.0, jnp.exp(values - mx_safe[seg_id])),
        seg_id, num_segments=num_segments,
    )
    out = jnp.where(sums > 0, jnp.log(jnp.maximum(sums, 1e-37)) + mx_safe, NEG)
    return out


@functools.partial(jax.jit, static_argnames=("beam_width", "blank_id"))
def _beam_scan(logits, length, beam_width, blank_id):
    """Returns (parents [T, W], syms [T, W], final scores [W])."""
    maxlen, vocab = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    W = beam_width
    K = vocab

    init = {
        # distinct dummy hashes so dead beams never merge
        "hash": jnp.uint32(17) + jnp.arange(W, dtype=jnp.uint32) * jnp.uint32(2654435761),
        "pb": jnp.where(jnp.arange(W) == 0, 0.0, NEG),
        "pnb": jnp.full((W,), NEG),
        "last": jnp.full((W,), -1, jnp.int32),
    }

    syms_all = jnp.arange(K, dtype=jnp.int32)

    def step(state, inputs):
        lp, t = inputs
        p_tot = jnp.logaddexp(
            jnp.maximum(state["pb"], NEG), jnp.maximum(state["pnb"], NEG)
        )
        p_tot = jnp.where(
            (state["pb"] <= NEG) & (state["pnb"] <= NEG), NEG, p_tot
        )

        # --- stay candidates (one per beam): blank, or repeat of last ---
        lp_blank = lp[blank_id]
        lp_last = jnp.where(
            state["last"] >= 0, lp[jnp.maximum(state["last"], 0)], NEG
        )
        stay_pb = jnp.where(p_tot <= NEG, NEG, p_tot + lp_blank)
        stay_pnb = jnp.where(state["pnb"] <= NEG, NEG, state["pnb"] + lp_last)
        stay_hash = state["hash"]
        stay_parent = jnp.arange(W, dtype=jnp.int32)
        stay_sym = jnp.full((W,), -1, jnp.int32)

        # --- extend candidates (beam x K, blank column dead) ---
        new_hash = (
            state["hash"][:, None] * _HASH_MUL
            + (syms_all[None, :].astype(jnp.uint32) + jnp.uint32(1))
        )
        is_repeat = syms_all[None, :] == state["last"][:, None]
        base = jnp.where(is_repeat, state["pb"][:, None], p_tot[:, None])
        ext_pnb = jnp.where(base <= NEG, NEG, base + lp[None, :])
        ext_pnb = jnp.where(syms_all[None, :] == blank_id, NEG, ext_pnb)
        ext_pb = jnp.full((W, K), NEG)
        ext_parent = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.int32)[:, None], (W, K)
        )
        ext_sym = jnp.broadcast_to(syms_all[None, :], (W, K))

        cand_hash = jnp.concatenate([stay_hash, new_hash.reshape(-1)])
        cand_pb = jnp.concatenate([stay_pb, ext_pb.reshape(-1)])
        cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
        cand_parent = jnp.concatenate([stay_parent, ext_parent.reshape(-1)])
        cand_sym = jnp.concatenate([stay_sym, ext_sym.reshape(-1)])
        N = cand_hash.shape[0]

        order = jnp.argsort(cand_hash)
        h = cand_hash[order]
        pb = cand_pb[order]
        pnb = cand_pnb[order]
        parent = cand_parent[order]
        sym = cand_sym[order]

        new_seg = jnp.concatenate(
            [jnp.ones((1,), bool), h[1:] != h[:-1]]
        )
        seg_id = jnp.cumsum(new_seg) - 1

        merged_pb = _segment_logsumexp(pb, seg_id, N)
        merged_pnb = _segment_logsumexp(pnb, seg_id, N)
        merged_tot = jnp.logaddexp(
            jnp.maximum(merged_pb, NEG), jnp.maximum(merged_pnb, NEG)
        )
        merged_tot = jnp.where(
            (merged_pb <= NEG) & (merged_pnb <= NEG), NEG, merged_tot
        )

        # representative candidate per segment: highest-prob member
        cand_tot = jnp.logaddexp(jnp.maximum(pb, NEG), jnp.maximum(pnb, NEG))
        seg_best = jax.ops.segment_max(cand_tot, seg_id, num_segments=N)
        is_best = cand_tot >= seg_best[seg_id] - 1e-9
        idx = jnp.arange(N)
        rep_idx = jax.ops.segment_min(
            jnp.where(is_best, idx, N), seg_id, num_segments=N
        )
        rep_idx = jnp.minimum(rep_idx, N - 1)

        seg_hash = jax.ops.segment_max(h, seg_id, num_segments=N)
        n_segs = seg_id[-1] + 1
        valid = jnp.arange(N) < n_segs
        scores = jnp.where(valid, merged_tot, NEG)

        top_scores, top_seg = jax.lax.top_k(scores, W)
        sel_rep = rep_idx[top_seg]
        sel = {
            "hash": seg_hash[top_seg],
            "pb": merged_pb[top_seg],
            "pnb": merged_pnb[top_seg],
            "last": jnp.where(
                sym[sel_rep] >= 0, sym[sel_rep],
                state["last"][parent[sel_rep]]
            ),
        }
        # freeze state past the sequence length
        active = t < length
        out_state = jax.tree.map(
            lambda new, old: jnp.where(active, new, old), sel, state
        )
        rec_parent = jnp.where(active, parent[sel_rep],
                               jnp.arange(W, dtype=jnp.int32))
        rec_sym = jnp.where(active, sym[sel_rep], -1)
        return out_state, (rec_parent, rec_sym)

    ts = jnp.arange(maxlen)
    final, (parents, syms) = jax.lax.scan(step, init, (logp, ts))
    p_tot = jnp.logaddexp(
        jnp.maximum(final["pb"], NEG), jnp.maximum(final["pnb"], NEG)
    )
    return parents, syms, p_tot


def _backtrace(parents, syms, scores):
    """Reverse-walk the recorded backpointers for the best final beam."""
    best = int(np.argmax(scores))
    seq = []
    beam = best
    for t in range(parents.shape[0] - 1, -1, -1):
        if syms[t, beam] >= 0:
            seq.append(int(syms[t, beam]))
        beam = int(parents[t, beam])
    seq.reverse()
    return seq, float(scores[best])


def ctc_beam_search_jax(logits, logit_length, beam_width=100, blank_id=None):
    """Decode one utterance on device; returns (ids list, score)."""
    logits = jnp.asarray(logits)
    if blank_id is None:
        blank_id = logits.shape[-1] - 1
    parents, syms, scores = _beam_scan(
        logits, jnp.asarray(logit_length, jnp.int32), beam_width, blank_id
    )
    return _backtrace(np.asarray(parents), np.asarray(syms),
                      np.asarray(scores))


@functools.partial(jax.jit, static_argnames=("beam_width", "blank_id"))
def _beam_scan_batch(logits, lengths, beam_width, blank_id):
    """vmapped beam scan: [B, T, V] -> (parents/syms [B, T, W], scores
    [B, W]). The whole batch decodes in ONE device dispatch — the batched
    serving analog of the reference's batch-1 protocol."""
    return jax.vmap(
        lambda l, n: _beam_scan(l, n, beam_width, blank_id)
    )(logits, lengths)


def ctc_beam_search_batch_jax(logits, logit_lengths, beam_width=100,
                              blank_id=None):
    """Decode a batch of utterances on device in one dispatch.

    logits [B, T, V], logit_lengths [B] -> list of (ids, score) per
    utterance. Same merged-prefix semantics as ``ctc_beam_search_jax``
    (per-utterance results are identical); only the dispatch is batched,
    so device fixed costs amortize across the batch for serving.
    """
    logits = jnp.asarray(logits)
    if blank_id is None:
        blank_id = logits.shape[-1] - 1
    parents, syms, scores = _beam_scan_batch(
        logits, jnp.asarray(logit_lengths, jnp.int32), beam_width, blank_id
    )
    parents = np.asarray(parents)
    syms = np.asarray(syms)
    scores = np.asarray(scores)
    return [
        _backtrace(parents[b], syms[b], scores[b])
        for b in range(logits.shape[0])
    ]
