"""Streaming endpointing + long-form segmented transcription.

A CTC model emits blank through silence, so a long enough run of trailing
argmax-blank frames marks end-of-speech; StreamingTranscriber tracks that
run, ``finalize_segment`` closes the open segment (greedy tokens or beam
hypothesis with frames) and restarts ONLY the decode state — the acoustic
stream keeps its carried recurrence. Recognizer.transcribe_long drives it
over whole recordings. The reference has no streaming/segmentation at all
(whole-utterance decode, tfsr/trainer_sr.py:96-117).
"""

import numpy as np
import jax
import pytest

BLANK = 5
V = 6


def _make_session(beam_width=None, chunk=4):
    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.streaming import StreamingTranscriber

    model = SequenceRouter(
        feat_dim=8, class_n=V, enc_num=2, caps_primary_num=4,
        caps_primary_dim=4, caps_conv_num=3, caps_conv_dim=4,
        caps_class_dim=4, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=4, caps_type="naive",
    )
    rng = jax.random.PRNGKey(0)
    feats = np.zeros((1, 32, 8), np.float32)
    variables = model.init(
        {"params": rng, "dropout": rng}, feats, np.asarray([32]), False
    )
    return StreamingTranscriber(
        model, variables, blank_id=BLANK, chunk=chunk,
        beam_width=beam_width,
    )


def _inject(session, path):
    """Feed crafted sharp logits straight into the decode plane (the
    acoustic cascade is exercised by test_streaming.py; this unit pins the
    endpoint/segment bookkeeping)."""
    logits = np.full((len(path), V), -10.0, np.float32)
    logits[np.arange(len(path)), path] = 10.0
    session._logits.append(logits)
    session._logit_frames += len(path)
    session._logit_ends.append(session._logit_frames)
    session._decode_available(limit=None)
    if session.beam_width:
        session._beam_advance(limit=None)


@pytest.mark.parametrize("beam", [None, 4])
def test_endpoint_and_segments(beam):
    session = _make_session(beam_width=beam)
    B = BLANK
    # segment 1: sym 1 @ frame 2, then 6 trailing blanks
    _inject(session, [B, B, 1, B, B, B, B, B, B])
    assert session.trailing_blank_frames == 6
    assert session.endpoint_detected(5)
    assert not session.endpoint_detected(7)
    seg1 = session.finalize_segment()
    assert seg1["ids"] == [1]
    assert seg1["frames"] == [2]
    assert (seg1["start_frame"], seg1["end_frame"]) == (0, 9)
    assert session.trailing_blank_frames == 0
    # segment 2: sym 3 run @ frames 11-12 (collapses to 11), 4 blanks
    _inject(session, [B, B, 3, 3, B, B, B, B])
    assert session.trailing_blank_frames == 4
    assert session.endpoint_detected(3)
    seg2 = session.finalize_segment()
    assert seg2["ids"] == [3]
    assert seg2["frames"] == [11]
    assert (seg2["start_frame"], seg2["end_frame"]) == (9, 17)
    if beam:
        # near-deterministic logits: log-score ~ 0 (float noise above)
        assert seg1["score"] < 1e-6 and seg2["score"] < 1e-6


def test_endpoint_needs_tokens():
    """Pure silence never endpoints (nothing to finalize)."""
    session = _make_session()
    _inject(session, [BLANK] * 20)
    assert session.trailing_blank_frames == 20
    assert not session.endpoint_detected(5)


def test_segment_beam_matches_offline_per_segment():
    """Each beam segment equals the offline device beam over exactly that
    segment's logits (the decode restart is exact — boundaries are in
    silence)."""
    from srf_tpu.ops.ctc_beam_jax import ctc_beam_search_jax

    session = _make_session(beam_width=4)
    B = BLANK
    path1 = [B, 1, B, 2, B, B, B]
    path2 = [B, 4, 4, B, B, B, B]
    _inject(session, path1)
    seg1 = session.finalize_segment()
    _inject(session, path2)
    seg2 = session.finalize_segment()

    def offline(path):
        logits = np.full((len(path), V), -10.0, np.float32)
        logits[np.arange(len(path)), path] = 10.0
        return ctc_beam_search_jax(logits, len(path), beam_width=4,
                                   blank_id=B, with_frames=True)

    ids1, score1, frames1 = offline(path1)
    assert (seg1["ids"], seg1["frames"]) == (ids1, frames1)
    assert seg1["score"] == pytest.approx(score1)
    ids2, _score2, frames2 = offline(path2)
    assert seg2["ids"] == ids2
    # segment-2 frames are GLOBAL: offset by the first segment's length
    assert seg2["frames"] == [f + len(path1) for f in frames2]
