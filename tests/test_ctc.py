"""Golden tests: CTC loss vs tf.nn.ctc_loss, decoders vs TF's decoders."""

import numpy as np
import pytest

import jax.numpy as jnp

from srf_tpu.ops.ctc import ctc_loss, ctc_loss_from_frames
from srf_tpu.ops.ctc_decode import beam_search_batch, greedy_decode

tf = pytest.importorskip("tensorflow")


def _random_problem(seed, batch=4, maxlen=23, vocab=7, maxlab=6):
    rng = np.random.RandomState(seed)
    logits = rng.randn(batch, maxlen, vocab + 1).astype(np.float32)
    logit_len = rng.randint(maxlab * 2 + 2, maxlen + 1, size=batch)
    label_len = rng.randint(1, maxlab + 1, size=batch)
    labels = np.zeros((batch, maxlab), np.int32)
    for i in range(batch):
        # label ids in [0, vocab) — id 0 is a REAL class (PAD symbol),
        # matching the reference's vocab layout
        labels[i, : label_len[i]] = rng.randint(0, vocab, size=label_len[i])
    return logits, logit_len, labels, label_len


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_loss_matches_tf_blank_last(seed):
    logits, logit_len, labels, label_len = _random_problem(seed)
    blank = logits.shape[-1] - 1
    expected = tf.nn.ctc_loss(
        labels,
        logits,
        label_len,
        logit_len,
        logits_time_major=False,
        blank_index=blank,
    ).numpy()
    got = np.asarray(
        ctc_loss(jnp.asarray(logits), jnp.asarray(logit_len), jnp.asarray(labels),
                 jnp.asarray(label_len))
    )
    np.testing.assert_allclose(got, expected, rtol=5e-4, atol=1e-2)


def test_ctc_loss_from_frames_ceil_semantics():
    logits, logit_len, labels, label_len = _random_problem(7)
    in_len_div = 4
    inp_len = logit_len * in_len_div - 2  # ceil((4n-2)/4) == n
    a = np.asarray(
        ctc_loss_from_frames(
            jnp.asarray(logits), jnp.asarray(inp_len), in_len_div,
            jnp.asarray(labels), jnp.asarray(label_len),
        )
    )
    b = np.asarray(
        ctc_loss(jnp.asarray(logits), jnp.asarray(logit_len), jnp.asarray(labels),
                 jnp.asarray(label_len))
    )
    np.testing.assert_allclose(a, b, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 3, 5])
def test_greedy_matches_tf(seed):
    logits, logit_len, _, _ = _random_problem(seed, batch=5, maxlen=31, vocab=9)
    blank = logits.shape[-1] - 1
    (decoded,), _ = tf.nn.ctc_greedy_decoder(
        np.transpose(logits, (1, 0, 2)), logit_len, merge_repeated=True,
        blank_index=blank,
    )
    dense = tf.sparse.to_dense(decoded, default_value=-1).numpy()
    ids, lengths = greedy_decode(jnp.asarray(logits), jnp.asarray(logit_len))
    ids, lengths = np.asarray(ids), np.asarray(lengths)
    for i in range(logits.shape[0]):
        expected = [x for x in dense[i] if x >= 0]
        got = list(ids[i, : lengths[i]])
        assert got == expected, (i, got, expected)


@pytest.mark.parametrize("seed", [0, 1, 4])
def test_beam_search_matches_tf_top1(seed):
    # moderately peaked logits: the top-1 hypothesis must agree with TF
    rng = np.random.RandomState(seed)
    batch, maxlen, vocab = 3, 18, 6
    logits = (rng.randn(batch, maxlen, vocab + 1) * 2.0).astype(np.float32)
    logit_len = np.full((batch,), maxlen, np.int32)
    blank = vocab
    (decoded,), _ = tf.nn.ctc_beam_search_decoder(
        np.transpose(logits, (1, 0, 2)), logit_len, beam_width=30, top_paths=1
    )
    dense = tf.sparse.to_dense(decoded, default_value=-1).numpy()
    ours = beam_search_batch(logits, logit_len, beam_width=30, blank_id=blank)
    for i in range(batch):
        expected = [int(x) for x in dense[i] if x >= 0]
        assert ours[i] == expected, (i, ours[i], expected)
