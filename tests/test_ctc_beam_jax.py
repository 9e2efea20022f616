"""On-device beam search vs the exact host decoders and TF."""

import numpy as np
import pytest

from srf_tpu.ops.ctc_beam_jax import (
    ctc_beam_search_batch_jax, ctc_beam_search_jax,
)
from srf_tpu.ops.ctc_decode import prefix_beam_search


@pytest.mark.parametrize("seed", range(6))
def test_jax_beam_matches_python(seed):
    rng = np.random.RandomState(seed)
    logits = (rng.randn(20, 7) * 2).astype(np.float32)
    got, _ = ctc_beam_search_jax(logits, 20, beam_width=30, blank_id=6)
    want = prefix_beam_search(logits, 20, beam_width=30, blank_id=6)[0][0]
    assert got == want, (seed, got, want)


def test_jax_beam_respects_length():
    rng = np.random.RandomState(0)
    logits = (rng.randn(20, 5) * 2).astype(np.float32)
    short, _ = ctc_beam_search_jax(logits, 9, beam_width=10, blank_id=4)
    want = prefix_beam_search(logits, 9, beam_width=10, blank_id=4)[0][0]
    assert short == want


def test_jax_beam_matches_tf_top1():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.RandomState(3)
    logits = (rng.randn(18, 6 + 1) * 2).astype(np.float32)
    (decoded,), _ = tf.nn.ctc_beam_search_decoder(
        logits[:, None, :], [18], beam_width=25, top_paths=1
    )
    expected = [int(x) for x in
                tf.sparse.to_dense(decoded, default_value=-1).numpy()[0]
                if x >= 0]
    got, _ = ctc_beam_search_jax(logits, 18, beam_width=25, blank_id=6)
    assert got == expected


def test_batched_beam_matches_single():
    """One batched dispatch == per-utterance decodes (ids AND scores),
    including ragged lengths."""
    rng = np.random.RandomState(5)
    batch, maxlen, vocab = 5, 16, 7
    logits = (rng.randn(batch, maxlen, vocab) * 2).astype(np.float32)
    lens = np.array([16, 12, 9, 16, 3], np.int32)
    got = ctc_beam_search_batch_jax(logits, lens, beam_width=20, blank_id=6)
    for b in range(batch):
        ids, score = ctc_beam_search_jax(
            logits[b], int(lens[b]), beam_width=20, blank_id=6
        )
        assert got[b][0] == ids, (b, got[b][0], ids)
        np.testing.assert_allclose(got[b][1], score, rtol=1e-6)
