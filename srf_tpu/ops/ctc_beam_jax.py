"""On-device CTC beam search (jittable, static shapes).

TPU-native replacement for ``tf.nn.ctc_beam_search_decoder``
(reference: tfsr/trainer_sr.py:110-112): merged-prefix beam search with the
blank/non-blank probability split, expressed as a ``lax.scan`` over time so
the whole decode runs on-chip.

Prefix identity is a rolling hash ``h(p+s) = h(p)*M + s+1`` with M odd, so M
is invertible mod 2^32. Beams hold unique prefixes, which pins down the
merge structure exactly: an extend candidate (beam i + symbol s) can only
ever collide with a STAY candidate (p_i+s == p_j), never with another
extend, and each stay has at most ONE merging extend — the one from its
parent prefix (p_j[:-1], last_j). So each step recovers every stay's parent
hash in closed form, ``h(parent_j) = (h(p_j) - (last_j+1)) * M^-1``, matches
it against the W beam hashes (a [W, W] compare — independent of vocab size,
unlike a [W, K, W] candidate compare), folds the single matched extend into
the stay's non-blank mass, and top-k's the survivors — no per-step sort
(the bitonic argsort of all W*(K+1) candidates used to dominate the scan).
The step body is also gather/scatter-free outside the top-k: the merge
mass is recomputed elementwise on the [W, W] match board, the dead-extend
kill is a 0/1 matmul, and the selected winners rebuild their fields from
one shared parent-beam gather instead of indexing the [W, K] candidate
boards (those gathers + the dead-mask scatter were ~60% of the step at
serving batch; decodes are bit-identical — same arithmetic, same inputs).
Backpointers (parent beam, appended symbol) are recorded per step; the best
path is reconstructed by a reverse walk (host-side, trivial).

A uint32 hash collision between two live distinct prefixes could fold one
extend into a wrong stay; with <= W*(K+1) candidates per step the
probability is negligible for speech vocabularies (cross-checked against
the exact C++ / Python decoders in tests), and the one-extend-per-stay
match keeps even a collision from duplicating probability mass.

The scan is factored as ``beam_init`` + ``_beam_chunk`` so streaming
(srf_tpu/streaming.py) can carry the beam state across pushed chunks and
emit frame-synchronous beam partials; offline decode is the same chunk fn
over the whole utterance, so streamed == offline by construction.

Optional shallow fusion (``lm=`` args): an n-gram LM (ops/ngram_lm.py,
dense conditional table) rides the scan — each beam carries its LM context
(one uint32, closed-form update) and accumulated LM score; candidates are
ranked and finally selected by ``ctc + weight*lm + bonus*|y|``. The CTC
blank/non-blank mass stays pure, so merges are exact: a merging extend
denotes the SAME prefix as its stay, hence the same LM score. With no LM
the extra state is inert and the decode is unchanged.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30
_HASH_MUL = jnp.uint32(1000003)
# modular inverse of the hash multiplier (1000003 is odd): recovers a
# prefix hash from its child's, h(p) = (h(p+s) - (s+1)) * M^-1 mod 2^32
_HASH_MUL_INV = jnp.uint32(pow(1000003, -1, 2**32))


def beam_init(beam_width, lm_ctx0=0, with_lm=None):
    """Fresh beam state: beam 0 holds the empty prefix, the rest are dead.

    ``lm_ctx0``: start-of-sequence LM context id (ngram_lm.NGramLM.ctx0)
    when decoding with shallow fusion. ``with_lm``: carry the
    shallow-fusion fields (LM context id + accumulated weighted LM score
    per beam). Without an LM those fields used to ride along inert — at
    serving batch their per-step gathers/selects were a measurable share
    of the scan (tools_dev/bench_beam_step.py ablations), so the state
    only carries them when an LM is actually fused. Default: carry them
    iff ``lm_ctx0`` was given — NOTE an order-1 LM's ctx0 is legitimately
    0, so LM callers should always pass ``with_lm=True`` explicitly."""
    W = beam_width
    if with_lm is None:
        with_lm = bool(lm_ctx0)
    state = {
        # distinct dummy hashes so dead beams never merge
        "hash": jnp.uint32(17)
        + jnp.arange(W, dtype=jnp.uint32) * jnp.uint32(2654435761),
        "pb": jnp.where(jnp.arange(W) == 0, 0.0, NEG),
        "pnb": jnp.full((W,), NEG),
        "last": jnp.full((W,), -1, jnp.int32),
    }
    if with_lm:
        state["ctx"] = jnp.full((W,), lm_ctx0, jnp.uint32)
        state["lm"] = jnp.zeros((W,))
    return state


def _beam_chunk(state, logp, ts, length, blank_id, lm=None,
                topk_approx=False):
    """Scan the beam over one block of frames.

    logp [T, V] log-probs, ts [T] global frame indices, length the global
    valid length (frames with ts >= length leave the state untouched).
    ``lm``: optional (table [C, V] log-probs, order, weight, bonus) for
    shallow fusion. ``topk_approx`` swaps the exact per-step top-k of the
    W*(K+1) candidates for lax.approx_max_k (TPU's binned partial
    reduction) — the beam then holds an approximate top-W set, so decodes
    can differ; plumbed as a static jit argument (every compiled entry is
    keyed on it). Returns (state, (parents [T, W], syms [T, W])).
    """
    W = state["hash"].shape[0]
    K = logp.shape[-1]
    # the backpointer tape is int16 (parent < W, sym < K): a vocab or beam
    # >= 2^15 would wrap negative and the backtrace drops sym < 0 entries,
    # silently truncating the decode — refuse at trace time instead
    if K >= 2**15 or W >= 2**15:
        raise ValueError(
            "int16 backpointer tape requires vocab (%d) and beam width (%d)"
            " < 32768" % (K, W))
    if (lm is not None) != ("ctx" in state):
        raise ValueError(
            "beam state LM fields do not match the lm argument; create "
            "the state with beam_init(..., with_lm=%s)" % (lm is not None))
    syms_all = jnp.arange(K, dtype=jnp.int32)
    if lm is not None:
        lm_table, lm_order, lm_weight, lm_bonus = lm
        lm_base = jnp.uint32(lm_table.shape[-1] + 1)
        lm_keep = jnp.uint32(
            (lm_table.shape[-1] + 1) ** max(lm_order - 2, 0)
        )

    def step(state, inputs):
        lp, t = inputs
        pb, pnb = state["pb"], state["pnb"]
        last, hsh = state["last"], state["hash"]
        p_tot = jnp.logaddexp(
            jnp.maximum(pb, NEG), jnp.maximum(pnb, NEG)
        )
        p_tot = jnp.where((pb <= NEG) & (pnb <= NEG), NEG, p_tot)

        # --- stay candidates (one per beam): blank, or repeat of last ---
        lp_blank = lp[blank_id]
        last_safe = jnp.maximum(last, 0)
        lp_last = jnp.where(last >= 0, lp[last_safe], NEG)
        stay_pb = jnp.where(p_tot <= NEG, NEG, p_tot + lp_blank)
        stay_pnb = jnp.where(pnb <= NEG, NEG, pnb + lp_last)
        stay_hash = hsh

        # --- extend candidates (beam x K, blank column dead) ---
        # pure elementwise: the [W, K] board is only ever read by the
        # top-k ranking — winners recompute their fields from the parent
        # beam (below), and the merge works on a [W, W] board, so no
        # [W, K]-shaped gather/scatter survives in the step body (the
        # gather + dead-mask scatter pair used to be ~60% of the step
        # cost at serving batch; see tools_dev/bench_beam_step.py)
        is_repeat = syms_all[None, :] == last[:, None]
        base = jnp.where(is_repeat, pb[:, None], p_tot[:, None])
        ext_pnb = jnp.where(base <= NEG, NEG, base + lp[None, :])
        ext_pnb = jnp.where(syms_all[None, :] == blank_id, NEG, ext_pnb)

        # --- merge each stay's unique parent extend into it ---
        # stay j merges with extend (i, last_j) iff hash_i == parent_hash_j;
        # a [W, W] compare, independent of vocab size. The merging extend's
        # mass is recomputed elementwise on the same [W, W] board
        # (base(i, last_j) + lp[last_j]) instead of gathered from ext_pnb —
        # identical arithmetic on identical inputs, so decodes are
        # unchanged bit-for-bit
        parent_hash = (
            stay_hash - (last_safe.astype(jnp.uint32) + jnp.uint32(1))
        ) * _HASH_MUL_INV
        rep_ji = last[:, None] == last[None, :]
        base_ji = jnp.where(rep_ji, pb[None, :], p_tot[None, :])
        match = (
            (parent_hash[:, None] == stay_hash[None, :])
            & (last[:, None] >= 0)
            & (last[:, None] != blank_id)
            & (base_ji > NEG)
        )  # [W_stay, W_beam]
        has_match = jnp.any(match, axis=1)
        matched_i = jnp.argmax(match, axis=1)
        merged_in = jnp.max(
            jnp.where(match, base_ji + lp_last[:, None], NEG), axis=1
        )
        # timestamp bookkeeping: if the merging extend carries MORE mass
        # than the stay's whole existing prefix mass, the tape entry for
        # this slot is recorded as that extend (same decoded sequence —
        # parent prefix + last == stay prefix by the hash match — but the
        # emission frame follows the dominant path, not a negligible-mass
        # early creation of the same prefix)
        stay_before = jnp.logaddexp(
            jnp.maximum(stay_pb, NEG), jnp.maximum(stay_pnb, NEG)
        )
        stay_before = jnp.where(
            (stay_pb <= NEG) & (stay_pnb <= NEG), NEG, stay_before
        )
        remerge = has_match & (merged_in > stay_before)
        stay_pnb = jnp.where(
            has_match,
            jnp.logaddexp(jnp.maximum(stay_pnb, NEG), merged_in),
            stay_pnb,
        )
        # kill merged extends so mass is never counted twice: the dead set
        # {(matched_i[j], last_j) : has_match[j]} lands as a 0/1 matmul
        # (dead[i, s] = any_j match[j, i] & (last_j == s); 0/1 values are
        # exact in any MXU precision) instead of a [W, K] scatter
        onehot_last = (
            syms_all[None, :] == last_safe[:, None]
        ).astype(jnp.float32)  # [W_stay, K]; rows with last_j < 0 never match
        dead = (match.astype(jnp.float32).T @ onehot_last) > 0.5  # [W, K]

        # --- top-k over stays + surviving extends ---
        stay_tot = jnp.logaddexp(
            jnp.maximum(stay_pb, NEG), jnp.maximum(stay_pnb, NEG)
        )
        stay_tot = jnp.where(
            (stay_pb <= NEG) & (stay_pnb <= NEG), NEG, stay_tot
        )
        if lm is None:
            # no fused LM: rank by pure CTC mass (the lm fields do not
            # exist in the state at all — their per-step selects/gathers
            # were pure overhead at serving batch)
            rank_ext = jnp.where(dead | (ext_pnb <= NEG), NEG, ext_pnb)
            rank_stay = jnp.where(stay_tot <= NEG, NEG, stay_tot)
        else:
            # accumulated weighted LM score of each extended prefix;
            # symbols outside the LM vocab (the appended blank) only
            # appear on NEG-killed candidates, so the clamp is inert
            lm_row = lm_table[state["ctx"].astype(jnp.int32)]  # [W, V]
            sym_clamped = jnp.minimum(syms_all, lm_table.shape[-1] - 1)
            lm_ext = (
                state["lm"][:, None]
                + lm_weight * lm_row[:, sym_clamped]
                + lm_bonus
            )
            lm_stay = state["lm"]
            rank_ext = jnp.where(
                dead | (ext_pnb <= NEG), NEG, ext_pnb + lm_ext
            )
            rank_stay = jnp.where(stay_tot <= NEG, NEG, stay_tot + lm_stay)
        scores = jnp.concatenate([rank_stay, rank_ext.reshape(-1)])
        if topk_approx:
            top_val, top_idx = jax.lax.approx_max_k(scores, W)
        else:
            top_val, top_idx = jax.lax.top_k(scores, W)
        is_stay = top_idx < W
        ext_idx = jnp.maximum(top_idx - W, 0)
        ext_beam = ext_idx // K
        ext_sym = (ext_idx % K).astype(jnp.int32)

        # --- winner fields, recomputed from the parent beam ---
        # a stay winner's parent beam is itself, an extend winner's is the
        # beam it extends, so ONE shared index vector gathers every piece
        # of parent state; each winner field is then the same arithmetic
        # expression the candidate boards used, on the same inputs —
        # bit-identical to gathering the boards, without the
        # [W*(K+1)]-flat gathers per field. The parent pieces ride as
        # bitcast-f32 columns of ONE packed [W, F] matrix (bitcasts move
        # bytes, never canonicalize), so the rebuild costs one gather:
        # every separate op in the scan body carries fixed overhead that
        # dominated the step at serving batch (bench_beam_step ablations)
        parent_i = jnp.where(is_stay, top_idx, ext_beam)
        f32 = functools.partial(jax.lax.bitcast_convert_type,
                                new_dtype=jnp.float32)
        flags = (
            matched_i.astype(jnp.int32)
            | (has_match.astype(jnp.int32) << 16)
            | (remerge.astype(jnp.int32) << 17)
        )
        cols = [pb, pnb, merged_in, f32(hsh), f32(last), f32(flags)]
        if lm is not None:
            cols += [state["lm"], f32(state["ctx"])]
        packed = jnp.stack(cols, axis=-1)[parent_i]  # the ONE gather
        pb_par = packed[:, 0]
        pnb_par = packed[:, 1]
        merged_par = packed[:, 2]
        hash_par = jax.lax.bitcast_convert_type(packed[:, 3], jnp.uint32)
        last_par = jax.lax.bitcast_convert_type(packed[:, 4], jnp.int32)
        flags_par = jax.lax.bitcast_convert_type(packed[:, 5], jnp.int32)
        mi_par = flags_par & 0xFFFF
        hasm_par = (flags_par >> 16) & 1 == 1
        rem_par = (flags_par >> 17) & 1 == 1
        if lm is not None:
            lm_par = packed[:, 6]
            ctx_par = jax.lax.bitcast_convert_type(
                packed[:, 7], jnp.uint32
            )

        ptot_par = jnp.logaddexp(
            jnp.maximum(pb_par, NEG), jnp.maximum(pnb_par, NEG)
        )
        ptot_par = jnp.where(
            (pb_par <= NEG) & (pnb_par <= NEG), NEG, ptot_par
        )
        lp_last_par = jnp.where(
            last_par >= 0, lp[jnp.maximum(last_par, 0)], NEG
        )
        # stay winner: stay_pb / merged stay_pnb of beam parent_i
        st_pb = jnp.where(ptot_par <= NEG, NEG, ptot_par + lp_blank)
        st_pnb0 = jnp.where(pnb_par <= NEG, NEG, pnb_par + lp_last_par)
        st_pnb = jnp.where(
            hasm_par,
            jnp.logaddexp(jnp.maximum(st_pnb0, NEG), merged_par),
            st_pnb0,
        )
        # extend winner: ext_pnb[parent_i, ext_sym] — a dead extend winner
        # (merge-killed, blank column, dead source beam; selected only
        # when the beam is underfull) is exactly a NEG-ranked one, so the
        # top-k VALUE already carries the dead-kill and no gather from
        # the dead board is needed
        ext_base = jnp.where(ext_sym == last_par, pb_par, ptot_par)
        ex_pnb = jnp.where(top_val <= NEG, NEG, ext_base + lp[ext_sym])
        ex_hash = hash_par * _HASH_MUL + (
            ext_sym.astype(jnp.uint32) + jnp.uint32(1)
        )

        sel = {
            "hash": jnp.where(is_stay, hash_par, ex_hash),
            "pb": jnp.where(is_stay, st_pb, NEG),
            "pnb": jnp.where(is_stay, st_pnb, ex_pnb),
            "last": jnp.where(is_stay, last_par, ext_sym),
        }
        if lm is not None:
            ext_ctx = (
                (ctx_par % lm_keep) * lm_base
                + ext_sym.astype(jnp.uint32)
            ) % jnp.uint32(lm_table.shape[0])  # order-1 folds to ctx 0
            sym_c = jnp.minimum(ext_sym, lm_table.shape[-1] - 1)
            lm_ext_sel = (
                lm_par
                + lm_weight * lm_table[ctx_par.astype(jnp.int32), sym_c]
                + lm_bonus
            )
            sel["ctx"] = jnp.where(is_stay, ctx_par, ext_ctx)
            sel["lm"] = jnp.where(is_stay, lm_par, lm_ext_sel)
        parent = jnp.where(
            is_stay, jnp.where(rem_par, mi_par, parent_i), ext_beam
        ).astype(jnp.int32)
        sym = jnp.where(
            is_stay,
            jnp.where(rem_par, jnp.maximum(last_par, 0), -1),
            ext_sym,
        ).astype(jnp.int32)

        # freeze state outside the valid range: past the sequence length,
        # and (streaming) warm-up rows with negative global frame indices —
        # the fused stream-step feeds the beam whole model blocks whose
        # leading rows may precede frame 0 (srf_tpu/streaming.py); frozen
        # rows record identity backpointers / sym -1, which backtraces skip
        active = (t >= 0) & (t < length)
        out_state = jax.tree.map(
            lambda new, old: jnp.where(active, new, old), sel, state
        )
        # tape entries are small ints (parent < W, sym < K, both well
        # under 2^15): int16 halves the [T, W] tape pair the scan stacks
        # per utterance — at serving batch the tapes are the dominant
        # scan output buffer ([B, T, W] x2)
        rec_parent = jnp.where(active, parent,
                               jnp.arange(W, dtype=jnp.int32)).astype(
                                   jnp.int16)
        rec_sym = jnp.where(active, sym, -1).astype(jnp.int16)
        return out_state, (rec_parent, rec_sym)

    # unroll: fewer XLA while-loop iterations, each fusing several frame
    # steps — the beam body is many small ops, so per-iteration overhead
    # is a real cost at serving batch sizes (measured via SRF_BEAM_UNROLL;
    # see BENCH_NOTES "beam scan unroll")
    unroll = int(os.environ.get("SRF_BEAM_UNROLL", "1") or 1)
    return jax.lax.scan(step, state, (logp, ts), unroll=max(unroll, 1))


def beam_scores(state):
    """Total score per beam: CTC mass plus the (weighted) fused-LM score
    accumulated in the state — pure CTC mass when decoding without an LM
    (the state then carries no lm field at all, see ``beam_init``)."""
    ctc = jnp.logaddexp(
        jnp.maximum(state["pb"], NEG), jnp.maximum(state["pnb"], NEG)
    )
    lm = state.get("lm")
    total = ctc if lm is None else ctc + lm
    return jnp.where(ctc <= NEG, NEG, total)


def _pack_lm(lm_table, lm_order, lm_weight, lm_bonus):
    if lm_table is None:
        return None
    return lm_table, lm_order, lm_weight, lm_bonus


def _topk_approx_default(topk_approx):
    """Resolve ``topk_approx=None`` to the SRF_BEAM_TOPK env default.

    The env var is only the process-level DEFAULT (a CLI convenience);
    the resolved boolean is a static jit argument, so both variants can
    coexist in one process and the choice always participates in the
    compilation cache key (ADVICE r4)."""
    if topk_approx is None:
        return os.environ.get("SRF_BEAM_TOPK", "") == "approx"
    return bool(topk_approx)


def lm_fusion_args(lm, n_classes):
    """Resolve ``lm`` = (NGramLM, weight, bonus) into the keyword args the
    jitted beam entry points take; ``n_classes`` is the logit vocab
    INCLUDING the appended CTC blank."""
    if lm is None:
        return {}
    lm_obj, weight, bonus = lm
    if lm_obj.vocab_size != n_classes - 1:
        raise ValueError(
            "LM vocab %d does not match decoder vocab %d (+1 blank)"
            % (lm_obj.vocab_size, n_classes - 1)
        )
    dev = getattr(lm_obj, "_device_table", None)
    if dev is None or dev.shape != lm_obj.table.shape:
        dev = jnp.asarray(lm_obj.table)
        lm_obj._device_table = dev
    return {
        "lm_table": dev,
        "lm_order": lm_obj.order,
        "lm_weight": float(weight),
        "lm_bonus": float(bonus),
        "lm_ctx0": lm_obj.ctx0,
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "beam_width", "blank_id", "lm_order", "lm_ctx0", "topk_approx",
    ),
)
def _beam_scan(logits, length, beam_width, blank_id, lm_table=None,
               lm_order=0, lm_weight=0.0, lm_bonus=0.0, lm_ctx0=0,
               topk_approx=False):
    """Returns (parents [T, W], syms [T, W], final scores [W])."""
    maxlen = logits.shape[0]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ts = jnp.arange(maxlen)
    final, (parents, syms) = _beam_chunk(
        beam_init(beam_width, lm_ctx0, with_lm=lm_table is not None),
        logp, ts, length, blank_id,
        _pack_lm(lm_table, lm_order, lm_weight, lm_bonus),
        topk_approx=topk_approx,
    )
    return parents, syms, beam_scores(final)


@functools.partial(
    jax.jit,
    static_argnames=("beam_width", "blank_id", "lm_order", "topk_approx"),
)
def beam_chunk_step(state, logits, t0, length, beam_width, blank_id,
                    lm_table=None, lm_order=0, lm_weight=0.0, lm_bonus=0.0,
                    topk_approx=False):
    """One streamed block: advance ``state`` over logits [T, V] whose global
    frame indices are [t0, t0+T). Returns (state, parents, syms, scores)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ts = t0 + jnp.arange(logits.shape[0])
    state, (parents, syms) = _beam_chunk(
        state, logp, ts, length, blank_id,
        _pack_lm(lm_table, lm_order, lm_weight, lm_bonus),
        topk_approx=topk_approx,
    )
    return state, parents, syms, beam_scores(state)


def _device_backtrace(parents, syms, scores):
    """On-device reverse walk of one utterance's backpointer tape.

    parents/syms [T, W] (int16 tape), scores [W] -> (ids [T], frames [T],
    length, best_score), ids/frames left-aligned and zero-padded. Same
    walk as :func:`_backtrace` (argmax ties resolve to the first maximum
    in both), expressed as a reverse ``lax.scan`` with a [1]-sized beam
    cursor, then the stable left-compaction used by greedy decode. Running
    it inside the batched decode dispatch means the [B, T, W] tape pair
    never leaves the device — at serving batch that fetch (plus the
    Python walk) dominated decode post-processing (BENCH_NOTES "device
    backtrace")."""
    maxlen = parents.shape[0]
    best = jnp.argmax(scores).astype(jnp.int32)

    def step(beam, xs):
        parent_row, sym_row = xs
        sym = sym_row[beam].astype(jnp.int32)
        return parent_row[beam].astype(jnp.int32), sym

    _, sym_seq = jax.lax.scan(step, best, (parents, syms), reverse=True)
    keep = sym_seq >= 0
    positions = jnp.arange(maxlen)
    order = jnp.argsort(~keep, stable=True)
    length = jnp.sum(keep)
    mask = positions < length
    ids = jnp.where(mask, sym_seq[order], 0)
    frames = jnp.where(mask, order, 0)
    return ids, frames, length, scores[best]


@functools.partial(
    jax.jit,
    static_argnames=(
        "beam_width", "blank_id", "lm_order", "lm_ctx0", "topk_approx",
    ),
)
def _beam_scan_batch_compact(logits, lengths, beam_width, blank_id,
                             lm_table=None, lm_order=0, lm_weight=0.0,
                             lm_bonus=0.0, lm_ctx0=0, topk_approx=False):
    """Batched beam scan + on-device backtrace in ONE dispatch.

    [B, T, V] -> (ids [B, T'], frames [B, T'], lengths [B], scores [B]):
    only the compact decode results are fetched; the [B, T, W]
    backpointer tapes stay on device (they are the dominant device->host
    transfer of the tape-returning path at serving batch)."""

    def one(l, n):
        parents, syms, scores = _beam_scan(
            l, n, beam_width, blank_id, lm_table, lm_order, lm_weight,
            lm_bonus, lm_ctx0, topk_approx,
        )
        return _device_backtrace(parents, syms, scores)

    return jax.vmap(one)(logits, lengths)


def _backtrace(parents, syms, scores, beam=None, with_frames=False):
    """Reverse-walk the recorded backpointers for the best final beam.

    ``with_frames``: also return the tape frame index at which each symbol
    entered the winning prefix — CTC emission timestamps. Tape indices are
    global logit-frame indices (invalid frames record identity
    backpointers and sym -1, so they never emit)."""
    best = int(np.argmax(scores)) if beam is None else beam
    seq = []
    frames = []
    beam = best
    for t in range(parents.shape[0] - 1, -1, -1):
        if syms[t, beam] >= 0:
            seq.append(int(syms[t, beam]))
            frames.append(t)
        beam = int(parents[t, beam])
    seq.reverse()
    frames.reverse()
    if with_frames:
        return seq, float(scores[best]), frames
    return seq, float(scores[best])


def ctc_beam_search_jax(logits, logit_length, beam_width=100, blank_id=None,
                        lm=None, with_frames=False, topk_approx=None):
    """Decode one utterance on device; returns (ids list, score) — or
    (ids, score, frames) with ``with_frames`` (per-symbol emission frame
    indices, see ``_backtrace``).

    ``lm``: optional (ngram_lm.NGramLM, weight, bonus) for shallow fusion.
    ``topk_approx=None`` follows the SRF_BEAM_TOPK env default.
    """
    logits = jnp.asarray(logits)
    if blank_id is None:
        blank_id = logits.shape[-1] - 1
    parents, syms, scores = _beam_scan(
        logits, jnp.asarray(logit_length, jnp.int32), beam_width, blank_id,
        topk_approx=_topk_approx_default(topk_approx),
        **lm_fusion_args(lm, logits.shape[-1]),
    )
    return _backtrace(np.asarray(parents), np.asarray(syms),
                      np.asarray(scores), with_frames=with_frames)


@functools.partial(
    jax.jit,
    static_argnames=(
        "beam_width", "blank_id", "lm_order", "lm_ctx0", "topk_approx",
    ),
)
def _beam_scan_batch(logits, lengths, beam_width, blank_id, lm_table=None,
                     lm_order=0, lm_weight=0.0, lm_bonus=0.0, lm_ctx0=0,
                     topk_approx=False):
    """vmapped beam scan: [B, T, V] -> (parents/syms [B, T, W], scores
    [B, W]). The whole batch decodes in ONE device dispatch — the batched
    serving analog of the reference's batch-1 protocol."""
    return jax.vmap(
        lambda l, n: _beam_scan(
            l, n, beam_width, blank_id, lm_table, lm_order, lm_weight,
            lm_bonus, lm_ctx0, topk_approx,
        )
    )(logits, lengths)


def ctc_beam_search_batch_jax(logits, logit_lengths, beam_width=100,
                              blank_id=None, lm=None, with_frames=False,
                              topk_approx=None):
    """Decode a batch of utterances on device in one dispatch.

    logits [B, T, V], logit_lengths [B] -> list of (ids, score) per
    utterance — (ids, score, frames) with ``with_frames``. Same
    merged-prefix semantics as ``ctc_beam_search_jax``
    (per-utterance results are identical); only the dispatch is batched,
    so device fixed costs amortize across the batch for serving.
    ``lm``: optional (ngram_lm.NGramLM, weight, bonus) shallow fusion,
    shared across the batch.
    """
    logits = jnp.asarray(logits)
    if blank_id is None:
        blank_id = logits.shape[-1] - 1
    ids, frames, lengths, scores = _beam_scan_batch_compact(
        logits, jnp.asarray(logit_lengths, jnp.int32), beam_width, blank_id,
        topk_approx=_topk_approx_default(topk_approx),
        **lm_fusion_args(lm, logits.shape[-1]),
    )
    ids = np.asarray(ids)
    frames = np.asarray(frames)
    lengths = np.asarray(lengths)
    scores = np.asarray(scores)
    out = []
    for b in range(logits.shape[0]):
        n = int(lengths[b])
        seq = [int(x) for x in ids[b, :n]]
        if with_frames:
            out.append((seq, float(scores[b]),
                        [int(x) for x in frames[b, :n]]))
        else:
            out.append((seq, float(scores[b])))
    return out


def ctc_beam_search_nbest_jax(logits, logit_lengths, beam_width=100,
                              blank_id=None, lm=None, top_paths=4,
                              topk_approx=None):
    """N-best batched decode: the final beam state already holds
    ``beam_width`` ranked hypotheses, so n-best costs ONE extra backtrace
    per path — no second search (the reference caps at top_paths=1,
    tfsr/trainer_sr.py:112). Returns, per utterance, up to ``top_paths``
    (ids, score, frames) triples, best first, deduplicated by id sequence
    (distinct beams can reconstruct the same prefix after merges of dead
    beams). The first triple equals the ``with_frames`` batch decode's
    result, so callers needing both pay for ONE scan.
    """
    logits = jnp.asarray(logits)
    if blank_id is None:
        blank_id = logits.shape[-1] - 1
    parents, syms, scores = _beam_scan_batch(
        logits, jnp.asarray(logit_lengths, jnp.int32), beam_width, blank_id,
        topk_approx=_topk_approx_default(topk_approx),
        **lm_fusion_args(lm, logits.shape[-1]),
    )
    parents = np.asarray(parents)
    syms = np.asarray(syms)
    scores = np.asarray(scores)
    out = []
    for b in range(logits.shape[0]):
        order = np.argsort(-scores[b])
        hyps, seen = [], set()
        for beam in order:
            if scores[b][beam] <= NEG / 2:
                break  # dead beams below
            ids, score, frames = _backtrace(
                parents[b], syms[b], scores[b], beam=int(beam),
                with_frames=True,
            )
            key = tuple(ids)
            if key in seen:
                continue
            seen.add(key)
            hyps.append((ids, score, frames))
            if len(hyps) >= top_paths:
                break
        out.append(hyps)
    return out
