"""CTC forced alignment: Viterbi-align a known transcript to logits.

Given frame logits and the REFERENCE label sequence, find the most
probable CTC path that spells exactly that sequence — yielding each
token's start/end frames (hence start times and durations). This is the
standard tool for corpus segmentation, subtitle timing and TTS data prep;
the reference toolkit has nothing like it (its decode emits bare ids,
reference: tfsr/trainer_sr.py:113-117).

TPU-native design: the classic 2L+1-state CTC trellis
(blank, y1, blank, y2, ..., blank) is swept by a ``lax.scan`` over frames
with a max-plus carry ``alpha [S]`` — the per-frame transition argmax
choices (stay / from previous state / skip over a blank) are recorded as a
[T, S] uint8 tape, vmapped over the batch; backtrace AND per-token span
extraction run on device in the same dispatch (mirrors the beam decoder's
on-device backtrace, ops/ctc_beam_jax.py), so only [B, L] starts/ends and
[B] scores are fetched — the choice tape never leaves the chip.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

NEG = -1e30


def _extended(labels, blank_id):
    """Interleave blanks: [L] -> z [2L+1] = (b, y1, b, y2, ..., b)."""
    L = labels.shape[0]
    z = jnp.full((2 * L + 1,), blank_id, labels.dtype)
    return z.at[1::2].set(labels)


@functools.partial(jax.jit, static_argnames=("blank_id",))
def _align_scan(logp, length, labels, label_length, blank_id):
    """One utterance's Viterbi trellis sweep.

    logp [T, V] log-probs; length valid frames; labels [L] (padded with
    anything past label_length); returns (choices [T, S] uint8,
    final alpha [S]) with S = 2L+1. Frames >= length freeze the carry
    (choice 0 = stay), so the host backtrace starts at frame length-1.
    """
    T = logp.shape[0]
    L = labels.shape[0]
    S = 2 * L + 1
    z = _extended(labels, blank_id)
    s_pos = jnp.arange(S)
    # states past the valid extent (beyond 2*label_length) are dead
    s_valid = s_pos < 2 * label_length + 1
    # skip transition s-2 -> s allowed for non-blank states whose symbol
    # differs from the symbol two states back (the classic CTC rule)
    z_m2 = jnp.concatenate([jnp.full((2,), -1, z.dtype), z[:-2]])
    can_skip = (s_pos % 2 == 1) & (z != z_m2) & (s_pos >= 2)

    alpha0 = jnp.where(s_pos == 0, 0.0, NEG)  # start in state 0 or 1
    alpha0 = jnp.where((s_pos == 1) & (label_length > 0), 0.0, alpha0)
    alpha0 = jnp.where(s_valid, alpha0, NEG) + jnp.where(
        s_valid, logp[0, z], 0.0
    )

    def step(alpha, inputs):
        lp, t = inputs
        stay = alpha
        prev = jnp.concatenate([jnp.array([NEG]), alpha[:-1]])
        skip = jnp.where(
            can_skip,
            jnp.concatenate([jnp.full((2,), NEG), alpha[:-2]]),
            NEG,
        )
        stacked = jnp.stack([stay, prev, skip])  # [3, S]
        choice = jnp.argmax(stacked, axis=0).astype(jnp.uint8)
        best = jnp.max(stacked, axis=0)
        new = jnp.where(s_valid, best + lp[z], NEG)
        active = t < length
        alpha_out = jnp.where(active, new, alpha)
        choice_out = jnp.where(active, choice, jnp.uint8(0))
        return alpha_out, choice_out

    ts = jnp.arange(1, T)
    alpha, choices_tail = jax.lax.scan(step, alpha0, (logp[1:], ts))
    choices = jnp.concatenate(
        [jnp.zeros((1, S), jnp.uint8), choices_tail], axis=0
    )
    return choices, alpha


def _device_backtrace_spans(choices, alpha, length, label_length, L):
    """On-device backtrace + span extraction for one utterance.

    Same walk as the host :func:`_backtrace` (end-state tie resolves to
    the final blank in both), as a reverse ``lax.scan`` with a [1]-sized
    state cursor, then per-token start/end frames as masked min/max over
    the state sequence — so only [L] starts/ends + the score leave the
    device instead of the [T, S] choice tape (the dominant fetch at
    alignment batch; see BENCH_NOTES "device backtrace")."""
    T, S = choices.shape
    s_pos = jnp.arange(S)
    s_true = 2 * label_length + 1
    fin = jnp.where(s_pos < s_true, alpha, NEG)
    end1 = s_true - 1
    end2 = jnp.maximum(s_true - 2, 0)
    s0 = jnp.where(
        (label_length > 0) & (fin[end2] > fin[end1]), end2, end1
    ).astype(jnp.int32)
    score = fin[s0]

    def step(s, inputs):
        ch_row, t = inputs
        active = t < length
        rec = jnp.where(active, s, -1)
        s_new = jnp.where(active, s - ch_row[s].astype(jnp.int32), s)
        return s_new, rec

    _, states = jax.lax.scan(
        step, s0, (choices, jnp.arange(T)), reverse=True
    )
    tok_states = 2 * jnp.arange(L, dtype=jnp.int32) + 1
    eq = states[None, :] == tok_states[:, None]  # [L, T]
    tpos = jnp.arange(T)
    starts = jnp.min(jnp.where(eq, tpos, T), axis=1)
    ends = jnp.max(jnp.where(eq, tpos, -1), axis=1) + 1
    return starts, ends, score


@functools.partial(jax.jit, static_argnames=("blank_id",))
def _align_spans_batch(logp, lengths, labels, label_lengths, blank_id):
    """Trellis sweep + backtrace + spans in ONE dispatch: [B, T, V] ->
    (starts [B, L], ends [B, L], scores [B])."""
    L = labels.shape[1]

    def one(lg, n, lb, m):
        choices, alpha = _align_scan(lg, n, lb, m, blank_id)
        return _device_backtrace_spans(choices, alpha, n, m, L)

    return jax.vmap(one)(logp, lengths, labels, label_lengths)


def ctc_forced_align(logits, logit_lengths, labels, label_lengths,
                     blank_id=None):
    """Batched forced alignment.

    Args:
        logits: [B, T, V] (pre-softmax).
        logit_lengths: [B] valid frame counts.
        labels: [B, L] reference ids (right-padded).
        label_lengths: [B] reference lengths.
    Returns:
        per-utterance list of ({"id", "start", "end"} per token, score):
        ``start`` = first frame Viterbi occupies the token's state,
        ``end`` = last such frame + 1; score = the Viterbi path log-prob.
        Utterances whose alignment is infeasible (more extended states
        than valid frames, or an all-NEG trellis) yield (None, -inf).
    """
    logits = jnp.asarray(logits)
    if blank_id is None:
        blank_id = logits.shape[-1] - 1
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    starts, ends, scores = _align_spans_batch(
        logp, jnp.asarray(logit_lengths, jnp.int32),
        jnp.asarray(labels, jnp.int32),
        jnp.asarray(label_lengths, jnp.int32), blank_id,
    )
    starts = np.asarray(starts)
    ends = np.asarray(ends)
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    out = []
    for b in range(logits.shape[0]):
        n, m = int(logit_lengths[b]), int(label_lengths[b])
        # feasibility: the trellis needs enough frames to visit every
        # label state (plus a frame between equal neighbors)
        if n <= 0 or m < 0 or 2 * m + 1 > 2 * n + 1 or (
            m > 0 and n < m
        ):
            out.append((None, float("-inf")))
            continue
        score = float(scores[b])
        if not np.isfinite(score) or score <= NEG / 2:
            out.append((None, float("-inf")))
            continue
        spans = [
            {
                "id": int(labels[b, i]),
                "start": int(starts[b, i]),
                "end": int(ends[b, i]),
            }
            for i in range(m)
        ]
        out.append((spans, score))
    return out
