"""On-device CTC beam search (jittable, static shapes).

TPU-native replacement for ``tf.nn.ctc_beam_search_decoder``
(reference: tfsr/trainer_sr.py:110-112): merged-prefix beam search with the
blank/non-blank probability split, expressed as a ``lax.scan`` over time so
the whole decode runs on-chip.

Prefix identity is a rolling hash. Beams hold unique prefixes, which pins
down the merge structure exactly: an extend candidate (beam i + symbol s)
can only ever collide with a STAY candidate (p_i+s == p_j), never with
another extend (p_i+s == p_i'+s' forces p_i == p_i'). So each step matches
the beam×K extend hashes against the W stay hashes directly (a [W,K,W]
compare on the VPU), folds matched extends into their stay's non-blank
mass, and top-k's the survivors — no per-step sort (the bitonic argsort of
all W*(K+1) candidates used to dominate the scan). Backpointers
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
        # Beams hold UNIQUE prefixes, so the only possible merges are
        # extend->stay: prefix_i + s == prefix_j exactly when extending
        # beam i with s reproduces beam j's prefix (extend-extend merges
        # would need two distinct prefixes to extend into the same one with
        # the same last symbol — impossible when prefixes are unique, since
        # p_i+s == p_j+s implies p_i == p_j). So instead of sorting all
        # W*(K+1) candidates by hash (a bitonic sort dominates the step),
        # match the W*K extend hashes against the W stay hashes directly,
        # fold matched extends into their stay, and top-k the rest.
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

        # --- extend candidates (beam x K, blank column dead) ---
        ext_hash = (
            state["hash"][:, None] * _HASH_MUL
            + (syms_all[None, :].astype(jnp.uint32) + jnp.uint32(1))
        )
        is_repeat = syms_all[None, :] == state["last"][:, None]
        base = jnp.where(is_repeat, state["pb"][:, None], p_tot[:, None])
        ext_pnb = jnp.where(base <= NEG, NEG, base + lp[None, :])
        ext_pnb = jnp.where(syms_all[None, :] == blank_id, NEG, ext_pnb)

        # --- merge extends into hash-equal stays (at most one match) ---
        live = ext_pnb > NEG
        match = (
            (ext_hash[:, :, None] == stay_hash[None, None, :])
            & live[:, :, None]
        )  # [W, K, W_stay]
        into_stay = jnp.where(match, ext_pnb[:, :, None], NEG)
        # each stay receives from <= W sources (one symbol each): logsumexp
        mx = jnp.max(into_stay, axis=(0, 1))  # [W_stay]
        mx_safe = jnp.where(mx <= NEG, 0.0, mx)
        add = jnp.sum(
            jnp.where(match, jnp.exp(into_stay - mx_safe[None, None, :]), 0.0),
            axis=(0, 1),
        )
        merged_in = jnp.where(add > 0, jnp.log(jnp.maximum(add, 1e-37)) + mx_safe, NEG)
        stay_pnb = jnp.where(
            merged_in > NEG, jnp.logaddexp(jnp.maximum(stay_pnb, NEG), merged_in),
            stay_pnb,
        )
        ext_pnb = jnp.where(jnp.any(match, axis=2), NEG, ext_pnb)

        # --- top-k over stays + surviving extends ---
        stay_tot = jnp.logaddexp(
            jnp.maximum(stay_pb, NEG), jnp.maximum(stay_pnb, NEG)
        )
        stay_tot = jnp.where(
            (stay_pb <= NEG) & (stay_pnb <= NEG), NEG, stay_tot
        )
        scores = jnp.concatenate([stay_tot, ext_pnb.reshape(-1)])
        _, top_idx = jax.lax.top_k(scores, W)
        is_stay = top_idx < W
        ext_idx = jnp.maximum(top_idx - W, 0)
        ext_beam = ext_idx // K
        ext_sym = (ext_idx % K).astype(jnp.int32)
        safe_stay = jnp.where(is_stay, top_idx, 0)

        sel = {
            "hash": jnp.where(
                is_stay, stay_hash[safe_stay], ext_hash.reshape(-1)[ext_idx]
            ),
            "pb": jnp.where(is_stay, stay_pb[safe_stay], NEG),
            "pnb": jnp.where(
                is_stay, stay_pnb[safe_stay], ext_pnb.reshape(-1)[ext_idx]
            ),
            "last": jnp.where(
                is_stay, state["last"][safe_stay], ext_sym
            ),
        }
        parent = jnp.where(is_stay, safe_stay, ext_beam).astype(jnp.int32)
        sym = jnp.where(is_stay, -1, ext_sym).astype(jnp.int32)

        # freeze state past the sequence length
        active = t < length
        out_state = jax.tree.map(
            lambda new, old: jnp.where(active, new, old), sel, state
        )
        rec_parent = jnp.where(active, parent,
                               jnp.arange(W, dtype=jnp.int32))
        rec_sym = jnp.where(active, sym, -1)
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
