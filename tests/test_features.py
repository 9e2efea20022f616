"""Feature front-end tests: shape/dimension contract + delta math."""

import numpy as np

from srf_tpu.data.features import (
    add_deltas,
    apply_cmvn,
    cmvn_stats,
    extract_fbank123,
    fbank_energy,
    mel_filterbank,
)


def test_fbank123_dimension_contract():
    rng = np.random.RandomState(0)
    sig = rng.randn(16000)  # 1 s @ 16 kHz
    feats = extract_fbank123(sig)
    # 10 ms shift, 25 ms window, snip-edges: 1 + (16000-400)//160 = 98 frames
    assert feats.shape == (98, 123)
    assert np.isfinite(feats).all()


def test_mel_filters_partition():
    mel = mel_filterbank(40, 512, 16000)
    assert mel.shape == (40, 257)
    # every filter has positive mass and peaks at ~1
    assert (mel.sum(axis=1) > 0).all()
    assert 0.5 < mel.max() <= 1.0


def test_deltas_of_linear_ramp():
    # delta of a linear ramp is the slope; delta-delta is 0 (interior frames)
    t = np.arange(20, dtype=np.float32)[:, None]
    feats = np.concatenate([2 * t, -3 * t], axis=1)
    out = add_deltas(feats)
    assert out.shape == (20, 6)
    np.testing.assert_allclose(out[5:-5, 2], 2.0, atol=1e-5)
    np.testing.assert_allclose(out[5:-5, 3], -3.0, atol=1e-5)
    np.testing.assert_allclose(out[5:-5, 4:], 0.0, atol=1e-5)


def test_cmvn_roundtrip():
    rng = np.random.RandomState(1)
    utts = [rng.randn(50, 8) * 3 + 5, rng.randn(30, 8) * 3 + 5]
    mean, std = cmvn_stats(utts)
    normed = apply_cmvn(np.concatenate(utts), mean, std)
    np.testing.assert_allclose(normed.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(normed.std(axis=0), 1.0, atol=1e-4)


def test_energy_is_first_coefficient():
    rng = np.random.RandomState(2)
    quiet = rng.randn(8000) * 0.01
    loud = rng.randn(8000) * 10.0
    fq = fbank_energy(quiet)
    fl = fbank_energy(loud)
    assert fl[:, 0].mean() > fq[:, 0].mean() + 5  # log-energy separates


def test_wav_to_cmvn_features_serving_front_end(tmp_path):
    """The serve --wav front-end: wav file -> fbank-123 -> utterance CMVN
    gives a [T, 123] float32 with ~zero mean / ~unit variance per dim —
    the same normalization contract the offline writer produces
    (reference: save_speech_data.py:162-163)."""
    import wave

    from srf_tpu.data.features import apply_cmvn, cmvn_stats
    from srf_tpu.tools.extract_features import read_wav

    rng = np.random.RandomState(0)
    sig = (rng.randn(16000) * 3000).astype(np.int16)
    path = tmp_path / "utt.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())

    signal, rate = read_wav(str(path))
    assert rate == 16000 and signal.shape == (16000,)
    feats = extract_fbank123(signal, rate)
    assert feats.shape[1] == 123
    norm = apply_cmvn(feats, *cmvn_stats([feats])).astype(np.float32)
    assert norm.dtype == np.float32
    np.testing.assert_allclose(norm.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(norm.std(axis=0), 1.0, atol=1e-3)
