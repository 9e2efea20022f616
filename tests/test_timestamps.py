"""Per-symbol emission timestamps across every decode path.

The reference emits bare hypothesis ids (tfsr/trainer_sr.py:113-117); the
TPU framework additionally reports WHEN each symbol was emitted — the
logit-frame index (greedy: first frame of the argmax run; beam: the frame
the symbol entered the winning prefix) and, at the serving layer, start
times in seconds (10 ms input frames x the model's subsampling). These
tests pin the convention on crafted logits where every decoder must agree,
and cross-check greedy == device beam == host-oracle beam == streamed beam.
"""

import numpy as np
import pytest

BLANK = 4
V = 5


def _sharp_logits():
    """[T=12, V=5] one-hot-ish logits: sym 1 @ frame 2, sym 2 @ frames
    5-6 (a run — collapses to first frame 5), sym 1 @ frame 9, blank
    elsewhere. All decoders must emit ids [1, 2, 1] at frames [2, 5, 9]."""
    path = [BLANK, BLANK, 1, BLANK, BLANK, 2, 2, BLANK, BLANK, 1, BLANK,
            BLANK]
    logits = np.full((len(path), V), -10.0, np.float32)
    logits[np.arange(len(path)), path] = 10.0
    return logits


def test_greedy_frames():
    from srf_tpu.ops.ctc_decode import greedy_decode_frames

    logits = _sharp_logits()
    ids, lens, frames = greedy_decode_frames(
        logits[None], np.asarray([logits.shape[0]]), blank_id=BLANK
    )
    n = int(lens[0])
    assert [int(x) for x in ids[0, :n]] == [1, 2, 1]
    assert [int(x) for x in frames[0, :n]] == [2, 5, 9]


def test_greedy_frames_respects_length():
    from srf_tpu.ops.ctc_decode import greedy_decode_frames

    logits = _sharp_logits()
    ids, lens, frames = greedy_decode_frames(
        logits[None], np.asarray([8]), blank_id=BLANK
    )
    n = int(lens[0])
    assert [int(x) for x in ids[0, :n]] == [1, 2]
    assert [int(x) for x in frames[0, :n]] == [2, 5]


def test_greedy_frames_matches_plain_greedy():
    from srf_tpu.ops.ctc_decode import greedy_decode, greedy_decode_frames

    rng = np.random.RandomState(0)
    logits = rng.randn(3, 40, V).astype(np.float32)
    lens = np.asarray([40, 17, 1])
    ids0, n0 = greedy_decode(logits, lens, blank_id=BLANK)
    ids1, n1, frames = greedy_decode_frames(logits, lens, blank_id=BLANK)
    np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    # frames strictly increase within each utterance
    for b in range(3):
        f = np.asarray(frames[b, : int(n1[b])])
        assert np.all(np.diff(f) > 0)
        assert np.all(f < lens[b])


def test_device_beam_frames():
    from srf_tpu.ops.ctc_beam_jax import ctc_beam_search_jax

    logits = _sharp_logits()
    ids, score, frames = ctc_beam_search_jax(
        logits, logits.shape[0], beam_width=4, blank_id=BLANK,
        with_frames=True,
    )
    assert ids == [1, 2, 1]
    assert frames == [2, 5, 9]


def test_device_beam_batch_frames_and_compat():
    from srf_tpu.ops.ctc_beam_jax import ctc_beam_search_batch_jax

    logits = _sharp_logits()
    batch = np.stack([logits, logits])
    lens = np.asarray([12, 8])
    out = ctc_beam_search_batch_jax(
        batch, lens, beam_width=4, blank_id=BLANK, with_frames=True
    )
    assert [ids for ids, _, _ in out] == [[1, 2, 1], [1, 2]]
    assert [fr for _, _, fr in out] == [[2, 5, 9], [2, 5]]
    # default return shape unchanged (ids, score)
    compat = ctc_beam_search_batch_jax(batch, lens, beam_width=4,
                                       blank_id=BLANK)
    assert len(compat[0]) == 2


def test_host_oracle_beam_frames():
    from srf_tpu.ops.ctc_decode import prefix_beam_search

    logits = _sharp_logits()
    (ids, _neg, frames), = prefix_beam_search(
        logits, logits.shape[0], beam_width=4, blank_id=BLANK,
        return_frames=True,
    )
    assert ids == [1, 2, 1]
    assert frames == [2, 5, 9]


def test_beam_frames_are_well_formed_random():
    """On arbitrary logits the device beam's frames are one per symbol,
    strictly increasing, and inside the valid range. (Exact frame equality
    with the host oracle is only pinned on peaked logits — the two
    implementations resolve merged-prefix timestamp ties differently:
    dominant-mass on device vs earliest-survivor on host.)"""
    from srf_tpu.ops.ctc_beam_jax import ctc_beam_search_jax

    rng = np.random.RandomState(7)
    for trial in range(5):
        logits = (3.0 * rng.randn(20, V)).astype(np.float32)
        n = int(rng.randint(5, 21))
        ids, _score, frames = ctc_beam_search_jax(
            logits, n, beam_width=8, blank_id=BLANK, with_frames=True
        )
        assert len(frames) == len(ids)
        assert all(0 <= f < n for f in frames), (trial, frames, n)
        assert all(b > a for a, b in zip(frames, frames[1:]))


@pytest.mark.parametrize("chunk", [3, 5, 12])
def test_streamed_beam_frames_match_offline(chunk):
    from srf_tpu.ops.ctc_beam_jax import (
        _backtrace, beam_chunk_step, beam_init, ctc_beam_search_jax,
    )

    logits = _sharp_logits()
    T = logits.shape[0]
    offline = ctc_beam_search_jax(logits, T, beam_width=4, blank_id=BLANK,
                                  with_frames=True)
    state = beam_init(4)
    tape_p, tape_s, scores = [], [], None
    for lo in range(0, T, chunk):
        hi = min(lo + chunk, T)
        block = np.zeros((chunk, V), np.float32)
        block[: hi - lo] = logits[lo:hi]
        state, parents, syms, scores = beam_chunk_step(
            state, block, np.int32(lo), np.int32(T), 4, BLANK
        )
        tape_p.append(np.asarray(parents)[: hi - lo])
        tape_s.append(np.asarray(syms)[: hi - lo])
    streamed = _backtrace(
        np.concatenate(tape_p), np.concatenate(tape_s), np.asarray(scores),
        with_frames=True,
    )
    assert streamed == offline
    assert streamed[2] == [2, 5, 9]


def test_streaming_transcriber_token_frames():
    """Greedy streaming emission frames match the offline greedy frames."""
    import jax

    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.ops.ctc_decode import greedy_decode_frames
    from srf_tpu.streaming import StreamingTranscriber

    model = SequenceRouter(
        feat_dim=8, class_n=6, enc_num=2, caps_primary_num=4,
        caps_primary_dim=4, caps_conv_num=3, caps_conv_dim=4,
        caps_class_dim=4, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=4, caps_type="naive",
    )
    rng = jax.random.PRNGKey(0)
    feats = np.random.RandomState(1).randn(60, 8).astype(np.float32)
    variables = model.init(
        {"params": rng, "dropout": rng}, feats[None],
        np.asarray([60]), False,
    )
    logits = model.apply(variables, feats[None], np.asarray([60]), False)
    _, lens, frames = greedy_decode_frames(
        np.asarray(logits), np.asarray([60 // 4]), blank_id=5
    )
    offline_frames = [int(x) for x in frames[0, : int(lens[0])]]

    session = StreamingTranscriber(model, variables, blank_id=5, chunk=4)
    session.push(feats)
    session.flush()
    assert session.token_frames == offline_frames


def test_nbest_device_beam():
    """N-best: ranked, deduped, and the first triple equals the plain
    with_frames batch decode."""
    from srf_tpu.ops.ctc_beam_jax import (
        ctc_beam_search_batch_jax, ctc_beam_search_nbest_jax,
    )

    rng = np.random.RandomState(3)
    logits = (2.0 * rng.randn(2, 15, V)).astype(np.float32)
    lens = np.asarray([15, 9])
    nbest = ctc_beam_search_nbest_jax(
        logits, lens, beam_width=8, blank_id=BLANK, top_paths=4
    )
    top = ctc_beam_search_batch_jax(
        logits, lens, beam_width=8, blank_id=BLANK, with_frames=True
    )
    for b in range(2):
        hyps = nbest[b]
        assert 1 <= len(hyps) <= 4
        assert hyps[0] == top[b]
        scores = [s for _, s, _ in hyps]
        assert scores == sorted(scores, reverse=True)
        seqs = [tuple(ids) for ids, _, _ in hyps]
        assert len(set(seqs)) == len(seqs)  # deduplicated
        for ids, _, frames in hyps:
            assert len(frames) == len(ids)
