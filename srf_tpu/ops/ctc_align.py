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
[T, S] uint8 tape, vmapped over the batch, ONE device dispatch; the
backtrace is a cheap host walk (mirrors the beam decoder's tape design,
ops/ctc_beam_jax.py).
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


@functools.partial(jax.jit, static_argnames=("blank_id",))
def _align_scan_batch(logp, lengths, labels, label_lengths, blank_id):
    return jax.vmap(
        lambda lg, n, lb, m: _align_scan(lg, n, lb, m, blank_id)
    )(logp, lengths, labels, label_lengths)


def _backtrace(choices, alpha, length, label_length):
    """Host walk of one utterance's choice tape.

    Returns (state_per_frame [length], score): the Viterbi state sequence
    over the extended trellis."""
    S_true = 2 * int(label_length) + 1
    fin = np.full((alpha.shape[0],), NEG)
    fin[:S_true] = alpha[:S_true]
    # must end in the last blank or the last label state
    end_states = [S_true - 1] + ([S_true - 2] if label_length > 0 else [])
    s = max(end_states, key=lambda i: fin[i])
    score = float(fin[s])
    states = np.zeros((int(length),), np.int64)
    for t in range(int(length) - 1, -1, -1):
        states[t] = s
        c = int(choices[t, s])
        s = s - c  # 0 stay, 1 prev, 2 skip
    return states, score


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
    choices, alpha = _align_scan_batch(
        logp, jnp.asarray(logit_lengths, jnp.int32),
        jnp.asarray(labels, jnp.int32),
        jnp.asarray(label_lengths, jnp.int32), blank_id,
    )
    choices = np.asarray(choices)
    alpha = np.asarray(alpha)
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
        states, score = _backtrace(choices[b], alpha[b], n, m)
        if not np.isfinite(score) or score <= NEG / 2:
            out.append((None, float("-inf")))
            continue
        spans = []
        for i in range(m):
            s_i = 2 * i + 1
            frames = np.nonzero(states == s_i)[0]
            spans.append({
                "id": int(labels[b, i]),
                "start": int(frames[0]),
                "end": int(frames[-1]) + 1,
            })
        out.append((spans, score))
    return out
