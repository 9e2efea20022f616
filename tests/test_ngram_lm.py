"""n-gram LM + shallow-fusion decode tests.

The reference has no language model (decode is the pure acoustic beam,
reference: tfsr/trainer_sr.py:110-112); fusion is a beyond-reference
capability, so correctness is established against first principles:
hand-computed Witten-Bell estimates, an exhaustive-search oracle for the
fused objective, and host-vs-device decoder agreement.
"""

import math

import numpy as np
import pytest

from srf_tpu.ops.ngram_lm import NGramLM, lm_ctx0, train_ngram


def test_unigram_witten_bell_hand_computed():
    # corpus: a a b  (V=3: symbols 0,1,2; 2 unseen)
    lm = train_ngram([[0, 0, 1]], vocab_size=3, order=1)
    # N=3 tokens, T=2 types; P(s) = (c + T/V) / (N + T)
    want = np.array([(2 + 2 / 3) / 5, (1 + 2 / 3) / 5, (0 + 2 / 3) / 5])
    np.testing.assert_allclose(np.exp(lm.table[0]), want, rtol=1e-6)
    assert math.isclose(float(np.exp(lm.table[0]).sum()), 1.0, rel_tol=1e-6)


def test_bigram_witten_bell_hand_computed():
    # corpus: "0 1 0 1 0" — after 0: {1,1}, after 1: {0,0}, after BOS: {0}
    lm = train_ngram([[0, 1, 0, 1, 0]], vocab_size=2, order=2)
    uni = np.exp(train_ngram([[0, 1, 0, 1, 0]], 2, 1).table[0])
    # context "0": c(0,1)=2, total=2, types=1 -> P(1|0)=(2+1*uni[1])/3
    p_1_given_0 = (2 + 1 * uni[1]) / 3
    p_0_given_0 = (0 + 1 * uni[0]) / 3
    np.testing.assert_allclose(
        np.exp(lm.table[0]), [p_0_given_0, p_1_given_0], rtol=1e-6
    )
    # BOS context (digit V=2): c(BOS,0)=1, types=1 -> (1+uni[0])/2
    np.testing.assert_allclose(
        np.exp(lm.table[2]), [(1 + uni[0]) / 2, (0 + uni[1]) / 2], rtol=1e-6
    )
    # unseen context "1 -> ?" exists (c(1,0)=2): check normalization of all
    # rows
    np.testing.assert_allclose(
        np.exp(lm.table).sum(axis=-1), np.ones(3), rtol=1e-6
    )


def test_score_ids_and_ctx_arithmetic():
    lm = train_ngram([[0, 1, 2, 0, 1]], vocab_size=3, order=3)
    ids = [0, 1, 2]
    # manual: P(0|BOS,BOS) P(1|BOS,0) P(2|0,1)
    b = 4
    want = (
        lm.table[lm_ctx0(3, 3), 0]
        + lm.table[(lm_ctx0(3, 3) % b) * b + 0, 1]
        + lm.table[0 * b + 1, 2]
    )
    assert math.isclose(lm.score_ids(ids), float(want), rel_tol=1e-6)


def test_save_load_roundtrip(tmp_path):
    lm = train_ngram([[0, 1, 0, 2]], vocab_size=3, order=2)
    path = str(tmp_path / "lm.npz")
    lm.save(path)
    back = NGramLM.load(path)
    assert back.order == 2 and back.vocab_size == 3
    np.testing.assert_array_equal(back.table, lm.table)


def test_markov_text_perplexity_beats_uniform():
    rng = np.random.RandomState(0)
    trans = _markov_chain(rng, 6)
    seqs = [_markov_sample(rng, trans, 30) for _ in range(50)]
    lm = train_ngram(seqs, vocab_size=6, order=2)
    held = [_markov_sample(rng, trans, 30) for _ in range(10)]
    assert lm.perplexity(held) < 5.0  # uniform would be 6.0


def _markov_chain(rng, v, concentration=0.3):
    trans = rng.dirichlet([concentration] * v, size=v)
    start = rng.dirichlet([concentration] * v)
    return start, trans


def _markov_sample(rng, chain, n):
    start, trans = chain
    out = [rng.choice(len(start), p=start)]
    for _ in range(n - 1):
        out.append(rng.choice(len(start), p=trans[out[-1]]))
    return [int(x) for x in out]


def _ctc_logprob(log_probs, y, blank):
    """Exact log P_ctc(y | x) by the forward algorithm (oracle)."""
    T, _ = log_probs.shape
    ext = [blank]
    for s in y:
        ext += [s, blank]
    S = len(ext)
    NEG = -1e30
    alpha = np.full((S,), NEG)
    alpha[0] = log_probs[0, ext[0]]
    if S > 1:
        alpha[1] = log_probs[0, ext[1]]
    for t in range(1, T):
        new = np.full((S,), NEG)
        for s in range(S):
            val = alpha[s]
            if s >= 1:
                val = np.logaddexp(val, alpha[s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                val = np.logaddexp(val, alpha[s - 2])
            new[s] = val + log_probs[t, ext[s]]
        alpha = new
    out = alpha[S - 1]
    if S > 1:
        out = np.logaddexp(out, alpha[S - 2])
    return float(out)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_fused_beam_matches_exhaustive_oracle(order):
    """Wide fused beam == argmax over ALL label sequences of
    ctc + w*lm + bonus*len (tiny shapes make enumeration exact)."""
    from srf_tpu.ops.ctc_beam_jax import ctc_beam_search_jax

    rng = np.random.RandomState(order)
    # W=128 >= the 121 possible distinct prefixes at V=3, T=4, so the beam
    # is exhaustive and MUST equal the brute-force argmax exactly
    V, T, blank = 3, 4, 3
    logits = rng.randn(T, V + 1).astype(np.float32) * 2.0
    lm = train_ngram(
        [_markov_sample(rng, _markov_chain(rng, V), 20) for _ in range(20)],
        vocab_size=V, order=order,
    )
    weight, bonus = 0.7, 0.4
    logp = logits - _np_lse(logits)

    best_score, best_y = -np.inf, None
    # enumerate all sequences up to length T
    all_seqs = [[]]
    frontier = [[]]
    for _ in range(T):
        frontier = [s + [v] for s in frontier for v in range(V)]
        all_seqs += frontier
    for y in all_seqs:
        # CTC needs |collapsed path| feasible: skip impossible lengths
        needed = len(y) + sum(
            1 for i in range(1, len(y)) if y[i] == y[i - 1]
        )
        if needed > T:
            continue
        score = _ctc_logprob(logp, y, blank)
        if score < -1e29:
            continue
        score += weight * lm.score_ids(y) + bonus * len(y)
        if score > best_score:
            best_score, best_y = score, y

    got_ids, got_score = ctc_beam_search_jax(
        logits, T, beam_width=128, lm=(lm, weight, bonus)
    )
    assert got_ids == best_y
    assert math.isclose(got_score, best_score, rel_tol=1e-4, abs_tol=1e-4)


def test_fused_device_matches_fused_host():
    from srf_tpu.ops.ctc_beam_jax import ctc_beam_search_jax
    from srf_tpu.ops.ctc_decode import prefix_beam_search

    rng = np.random.RandomState(7)
    V, T = 5, 24
    logits = rng.randn(T, V + 1).astype(np.float32) * 1.5
    lm = train_ngram(
        [_markov_sample(rng, _markov_chain(rng, V), 40) for _ in range(30)],
        vocab_size=V, order=3,
    )
    fused = (lm, 0.5, 0.2)
    (host_ids, host_neg), = prefix_beam_search(
        logits, T, beam_width=32, lm=fused
    )
    dev_ids, dev_score = ctc_beam_search_jax(
        logits, T, beam_width=32, lm=fused
    )
    assert dev_ids == host_ids
    assert math.isclose(dev_score, -host_neg, rel_tol=1e-3, abs_tol=1e-3)


def test_fusion_changes_ranking_toward_lm():
    """With a near-tied acoustic pair, fusion must flip the decision to the
    LM-preferred symbol."""
    from srf_tpu.ops.ctc_beam_jax import ctc_beam_search_jax

    V, blank = 2, 2
    # logits: a symbol MUST be emitted at t=1 (blank is dead there) and
    # symbol 1 is acoustically *slightly* better than 0
    logits = np.full((3, V + 1), -5.0, np.float32)
    logits[0, blank] = 2.0
    logits[2, blank] = 2.0
    logits[1, 0] = 1.9
    logits[1, 1] = 2.0
    lm = train_ngram([[0] * 50 + [1]], vocab_size=V, order=1)  # LM loves 0
    base_ids, _ = ctc_beam_search_jax(logits, 3, beam_width=8)
    fused_ids, _ = ctc_beam_search_jax(
        logits, 3, beam_width=8, lm=(lm, 5.0, 0.0)
    )
    assert base_ids == [1]
    assert fused_ids == [0]


def test_streamed_fused_beam_matches_offline():
    from srf_tpu.ops.ctc_beam_jax import (
        _backtrace, beam_chunk_step, beam_init, ctc_beam_search_jax,
        lm_fusion_args,
    )

    rng = np.random.RandomState(3)
    V, T, W = 4, 30, 16
    logits = rng.randn(T, V + 1).astype(np.float32) * 1.5
    lm = train_ngram(
        [_markov_sample(rng, _markov_chain(rng, V), 40) for _ in range(30)],
        vocab_size=V, order=2,
    )
    fused = (lm, 0.6, 0.1)
    want_ids, want_score = ctc_beam_search_jax(logits, T, W, lm=fused)

    kw = lm_fusion_args(fused, V + 1)
    ctx0 = kw.pop("lm_ctx0")
    for chunk in (5, 7, 30):
        state = beam_init(W, ctx0, with_lm=True)
        parents, syms = [], []
        t0 = 0
        while t0 < T:
            block = logits[t0:t0 + chunk]
            state, p, s, scores = beam_chunk_step(
                state, block, t0, T, W, V, **kw
            )
            parents.append(np.asarray(p))
            syms.append(np.asarray(s))
            t0 += block.shape[0]
        ids, score = _backtrace(
            np.concatenate(parents), np.concatenate(syms),
            np.asarray(scores),
        )
        assert ids == want_ids, chunk
        assert math.isclose(score, want_score, rel_tol=1e-4, abs_tol=1e-4)


def test_no_lm_state_is_inert():
    """Decoding without an LM is bit-identical to the pre-fusion decoder:
    scores are pure CTC mass."""
    from srf_tpu.ops.ctc_beam_jax import ctc_beam_search_jax
    from srf_tpu.ops.ctc_decode import prefix_beam_search

    rng = np.random.RandomState(11)
    logits = rng.randn(20, 6).astype(np.float32) * 2
    (host_ids, host_neg), = prefix_beam_search(logits, 20, beam_width=16)
    dev_ids, dev_score = ctc_beam_search_jax(logits, 20, beam_width=16)
    assert dev_ids == host_ids
    assert math.isclose(dev_score, -host_neg, rel_tol=1e-3, abs_tol=1e-3)


def test_table_size_guard():
    with pytest.raises(ValueError, match="dense"):
        train_ngram([[0]], vocab_size=4000, order=4)


def _np_lse(x):
    m = np.max(x, axis=-1, keepdims=True)
    return m + np.log(np.sum(np.exp(x - m), axis=-1, keepdims=True))
