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


# ------------------------------------------------ Kaldi spec-oracle golden


def _kaldi_oracle_fbank123(wave, sample_rate=16000):
    """Independent re-implementation of the Kaldi pipeline the reference
    invokes (egs/script/fbank123.sh:9-18: compute-fbank-feats
    --num-mel-bins=40 --use-energy=True | add-deltas), written per-frame,
    straight from the Kaldi algorithm definitions (feature-window.cc
    ExtractWindow/ProcessWindow, mel-computations.cc MelBanks,
    feature-fbank.cc, delta-features.cc DeltaFeatures) with dither=0.
    Deliberately structured differently from srf_tpu/data/features.py
    (python per-frame loops, per-fft-bin mel integration over the
    NON-nyquist bins as Kaldi does) so agreement is evidence, not an
    identity. Divergences from true Kaldi defaults are documented in
    docs/FRONTEND.md (dither=0 for determinism is the only one)."""
    flt_eps = float(np.finfo(np.float32).eps)
    frame_len = 400   # 25 ms @ 16 kHz
    shift = 160       # 10 ms
    nfft = 512        # round up to power of two
    # --- MelBanks(num_bins=40, low=20, high=nyquist), bins 0..nfft/2-1
    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)
    num_bins = 40
    mel_lo, mel_hi = mel(20.0), mel(sample_rate / 2.0)
    delta_mel = (mel_hi - mel_lo) / (num_bins + 1)
    fft_bin_width = sample_rate / nfft
    weights = np.zeros((num_bins, nfft // 2))
    for b in range(num_bins):
        left, center, right = (mel_lo + delta_mel * (b + k) for k in range(3))
        for j in range(nfft // 2):
            m = mel(fft_bin_width * j)
            if left < m < right:
                weights[b, j] = ((m - left) / (center - left) if m <= center
                                 else (right - m) / (right - center))
    n_frames = 1 + (len(wave) - frame_len) // shift  # snip-edges
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame_len)
                              / (frame_len - 1))) ** 0.85  # povey
    rows = []
    for t in range(n_frames):
        x = np.array(wave[t * shift : t * shift + frame_len], np.float64)
        x -= x.mean()                      # remove_dc_offset
        raw_energy = np.log(max(np.dot(x, x), flt_eps))  # before preemph
        y = x.copy()                       # preemphasis 0.97, in-place order
        for i in range(frame_len - 1, 0, -1):
            y[i] -= 0.97 * y[i - 1]
        y[0] -= 0.97 * y[0]
        y *= win
        spec = np.abs(np.fft.rfft(y, nfft)) ** 2
        mel_e = weights @ spec[: nfft // 2]
        rows.append(np.concatenate(
            [[raw_energy], np.log(np.maximum(mel_e, flt_eps))]
        ))
    feats = np.asarray(rows)
    # --- add-deltas (order 2, window 2): combined filters, index clamping
    base = np.arange(-2, 3) / 10.0
    filt2 = np.convolve(base, base)
    out = np.zeros((n_frames, 123))
    for t in range(n_frames):
        out[t, :41] = feats[t]
        for j in range(-2, 3):
            out[t, 41:82] += base[j + 2] * feats[min(max(t + j, 0),
                                                     n_frames - 1)]
        for j in range(-4, 5):
            out[t, 82:] += filt2[j + 4] * feats[min(max(t + j, 0),
                                                    n_frames - 1)]
    return out


def test_fbank123_matches_kaldi_spec_oracle():
    """features.extract_fbank123 == the independently-written Kaldi
    oracle on a deterministic multi-tone + noise waveform (VERDICT r3
    item 5). Covers framing, dc removal, raw energy, in-place
    preemphasis, povey window, mel-domain triangles, log floors, and
    the combined-filter clamped deltas (incl. the edge frames where a
    recursive delta-of-delta formulation diverges)."""
    from srf_tpu.data.features import extract_fbank123

    rng = np.random.RandomState(42)
    t = np.arange(4000) / 16000.0
    wave = (
        0.7 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 3173.0 * t + 0.5)
        + 0.05 * rng.randn(4000)
        + 0.01  # dc offset the front-end must remove
    ).astype(np.float32)
    got = extract_fbank123(wave)
    want = _kaldi_oracle_fbank123(wave)
    assert got.shape == want.shape == (1 + (4000 - 400) // 160, 123)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fbank123_oracle_on_silence_hits_floors():
    """Exact-zero audio exercises the Kaldi float-epsilon floors."""
    from srf_tpu.data.features import extract_fbank123

    wave = np.zeros(1600, np.float32)
    got = extract_fbank123(wave)
    want = _kaldi_oracle_fbank123(wave)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    flt_eps = float(np.finfo(np.float32).eps)
    np.testing.assert_allclose(got[:, 0], np.log(flt_eps), rtol=1e-5)
