"""CTC forced alignment: jitted trellis scan vs a brute-force oracle.

The oracle enumerates the classic Viterbi DP in plain python over the
2L+1-state trellis; the device implementation (ops/ctc_align.py) must
reproduce its path (state occupancy spans) and score exactly. Sharp-logit
cases additionally pin the convention against the greedy timestamps.
"""

import numpy as np
import pytest

BLANK = 4
V = 5


def _oracle(logits, n, labels, blank_id):
    """Plain-python Viterbi over the CTC trellis; returns (spans, score)
    like ctc_forced_align for one utterance."""
    x = logits[:n].astype(np.float64)
    m = x.max(-1, keepdims=True)
    logp = x - m - np.log(np.exp(x - m).sum(-1, keepdims=True))
    L = len(labels)
    S = 2 * L + 1
    z = [blank_id if s % 2 == 0 else labels[s // 2] for s in range(S)]
    NEG = -1e30
    alpha = [[NEG] * S for _ in range(n)]
    back = [[0] * S for _ in range(n)]
    alpha[0][0] = logp[0][z[0]]
    if L > 0:
        alpha[0][1] = logp[0][z[1]]
    for t in range(1, n):
        for s in range(S):
            cands = [alpha[t - 1][s]]
            if s >= 1:
                cands.append(alpha[t - 1][s - 1])
            else:
                cands.append(NEG)
            if s >= 2 and s % 2 == 1 and z[s] != z[s - 2]:
                cands.append(alpha[t - 1][s - 2])
            else:
                cands.append(NEG)
            c = int(np.argmax(cands))
            back[t][s] = c
            alpha[t][s] = cands[c] + logp[t][z[s]]
    ends = [(S - 1, alpha[n - 1][S - 1])]
    if L > 0:
        ends.append((S - 2, alpha[n - 1][S - 2]))
    s, score = max(ends, key=lambda kv: kv[1])
    if score <= NEG / 2:
        return None, float("-inf")
    states = [0] * n
    for t in range(n - 1, -1, -1):
        states[t] = s
        s -= back[t][s]
    spans = []
    for i in range(L):
        frames = [t for t in range(n) if states[t] == 2 * i + 1]
        spans.append({"id": labels[i], "start": frames[0],
                      "end": frames[-1] + 1})
    return spans, float(score)


def test_matches_oracle_random():
    from srf_tpu.ops.ctc_align import ctc_forced_align

    rng = np.random.RandomState(0)
    cases = [
        ([1, 2, 1], 16), ([3], 5), ([2, 2], 8), ([1, 2, 3, 1], 12),
        ([], 6),
    ]
    B = len(cases)
    T, Lmax = 16, 4
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    labels = np.zeros((B, Lmax), np.int32)
    lab_lens = np.zeros((B,), np.int32)
    lens = np.zeros((B,), np.int32)
    for b, (y, n) in enumerate(cases):
        labels[b, : len(y)] = y
        lab_lens[b] = len(y)
        lens[b] = n
    got = ctc_forced_align(logits, lens, labels, lab_lens, blank_id=BLANK)
    for b, (y, n) in enumerate(cases):
        want_spans, want_score = _oracle(logits[b], n, y, BLANK)
        spans, score = got[b]
        assert spans == want_spans, (b, spans, want_spans)
        assert score == pytest.approx(want_score, rel=1e-5, abs=1e-4)


def test_sharp_logits_match_greedy_frames():
    """Forced alignment of the greedy transcript starts each token at its
    greedy emission frame on peaked logits."""
    from srf_tpu.ops.ctc_align import ctc_forced_align
    from srf_tpu.ops.ctc_decode import greedy_decode_frames

    path = [BLANK, BLANK, 1, BLANK, BLANK, 2, 2, BLANK, BLANK, 1, BLANK,
            BLANK]
    logits = np.full((len(path), V), -10.0, np.float32)
    logits[np.arange(len(path)), path] = 10.0
    ids, lens, frames = greedy_decode_frames(
        logits[None], np.asarray([len(path)]), blank_id=BLANK
    )
    y = [int(x) for x in ids[0, : int(lens[0])]]
    gframes = [int(x) for x in np.asarray(frames)[0, : int(lens[0])]]
    (spans, score), = ctc_forced_align(
        logits[None], [len(path)], np.asarray([y]), [len(y)],
        blank_id=BLANK,
    )
    assert [s["id"] for s in spans] == y == [1, 2, 1]
    assert [s["start"] for s in spans] == gframes == [2, 5, 9]
    assert spans[1]["end"] == 7  # the 2-frame run of symbol 2
    assert score == pytest.approx(0.0, abs=1e-3)


def test_infeasible_alignment_reports_none():
    from srf_tpu.ops.ctc_align import ctc_forced_align

    rng = np.random.RandomState(1)
    logits = rng.randn(2, 4, V).astype(np.float32)
    # 5 labels into 4 frames: impossible; and 'aa' into 1 frame
    out = ctc_forced_align(
        logits, [4, 1], np.asarray([[1, 2, 3, 1, 2], [1, 1, 0, 0, 0]]),
        [5, 2], blank_id=BLANK,
    )
    assert out[0] == (None, float("-inf"))
    assert out[1] == (None, float("-inf"))


def test_respects_logit_length():
    """Frames past logit_length never affect the alignment."""
    from srf_tpu.ops.ctc_align import ctc_forced_align

    rng = np.random.RandomState(2)
    logits = rng.randn(1, 20, V).astype(np.float32)
    (a_spans, a_score), = ctc_forced_align(
        logits, [12], np.asarray([[1, 3]]), [2], blank_id=BLANK
    )
    logits2 = logits.copy()
    logits2[:, 12:] = rng.randn(1, 8, V) * 50
    (b_spans, b_score), = ctc_forced_align(
        logits2, [12], np.asarray([[1, 3]]), [2], blank_id=BLANK
    )
    assert a_spans == b_spans
    assert a_score == pytest.approx(b_score)
