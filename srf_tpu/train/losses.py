"""Auxiliary losses: label smoothing CE, MWER expected-error, perplexity.

Ports of the reference's loss library (present there for attention decoders
and MWER experiments; not wired into the CTC trainers — same status here,
exposed for API completeness):

- :func:`loss_ce` with neighbor smoothing (Chorowski'16) and uniform label
  smoothing (reference: tfsr/helper/train_helper.py:78-146),
- :func:`loss_ewerr` — minimum word error rate expected-WER loss over
  n-best hypotheses (Prabhavalkar ICASSP'18)
  (reference: train_helper.py:192-267),
- :func:`ppl` — masked accumulated log-probability
  (reference: train_helper.py:171-189),
- :func:`loss_function_w2v` — weighted binary CE for word2vec-style
  pretraining (reference: train_helper.py:149-157),
- :func:`shuffle_data` — epoch-boundary text shuffle
  (reference: train_helper.py:160-169).
"""

import numpy as np

import jax
import jax.numpy as jnp

from srf_tpu.config.constants import Constants


def loss_function_w2v(real, pred, weights, smoothing=0.0):
    """Weighted binary cross-entropy (from logits), summed."""
    real = real.astype(jnp.float32)
    if smoothing:
        real = real * (1.0 - smoothing) + 0.5 * smoothing
    per_elem = (
        jnp.maximum(pred, 0.0) - pred * real + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )
    per_example = jnp.mean(per_elem, axis=-1) * weights
    return jnp.sum(per_example)


# single implementation in utils/misc.py (both port the same reference
# helper, train_helper.py:159-168; two copies had drifted on seed=None
# semantics — the misc version never mutates the global numpy RNG)
from srf_tpu.utils.misc import shuffle_data  # noqa: E402,F401


def _loss_sm_neighbor(labels, logits, confidence, output_dim):
    """Neighborhood label smoothing: mass (1-c)/2 on each adjacent label."""
    ex_real = jax.nn.one_hot(labels, output_dim)
    if 0.0 < confidence < 1.0:
        left = jnp.pad(ex_real[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
        right = jnp.pad(ex_real[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
        ex_real = (
            ex_real * confidence
            + left * ((1 - confidence) / 2)
            + right * ((1 - confidence) / 2)
        )
    log_probs = jax.nn.log_softmax(logits)
    loss = -jnp.sum(ex_real * log_probs, axis=-1)
    mask = (labels != 0).astype(loss.dtype)
    return loss * mask


def _loss_sm_label(labels, logits, confidence, output_dim):
    """Uniform label smoothing with the minimum-entropy normalizer
    subtracted (transformer-official style)."""
    low_confidence = (1.0 - confidence) / (output_dim - 1)
    one_hot = jax.nn.one_hot(labels, output_dim)
    soft_targets = one_hot * confidence + (1.0 - one_hot) * low_confidence
    xentropy = -jnp.sum(soft_targets * jax.nn.log_softmax(logits), axis=-1)
    norm_const = -(
        confidence * jnp.log(confidence)
        + (output_dim - 1) * low_confidence * jnp.log(low_confidence + 1e-20)
    )
    xentropy = xentropy - norm_const
    return xentropy * (labels != 0).astype(xentropy.dtype)


def loss_ce(smoothing_type, labels, logits, confidence, output_dim):
    if smoothing_type == Constants.SM_NEIGHBOR:
        return _loss_sm_neighbor(labels, logits, confidence, output_dim)
    if smoothing_type == Constants.SM_LABEL:
        return _loss_sm_label(labels, logits, confidence, output_dim)
    return None


def ppl(labels, logits, seq_len):
    """Masked accumulated token log-probability."""
    log_probs = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(
        log_probs, labels[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    mask = (
        jnp.arange(nll.shape[1])[None, :] < seq_len[:, None]
    ).astype(nll.dtype)
    return jnp.sum(nll * mask)


def loss_ewerr(word_errors, lprobss):
    """Expected word-error loss over n-best hypotheses.

    Loss = sum_i P_hat(y_i|X) * (WE(y_i, y*) - W_hat), with P_hat the
    distribution renormalized over the beam and W_hat the beam-average error.

    Args:
        word_errors: [batch, beam] edit distances of each hypothesis
            (computed on host with utils.edit_distance.compute_wer — string
            processing is not a device op).
        lprobss: [batch, beam] hypothesis log-probabilities.
    Returns:
        [batch] expected-error losses.
    """
    # softmax IS the beam renormalization exp(l_i)/sum_j exp(l_j), but
    # max-subtracted: raw exp underflows to 0/0 = NaN once every
    # hypothesis NLL exceeds ~87 nats, which real utterances always do
    p_hat = jax.nn.softmax(lprobss, axis=-1)
    w_hat = jnp.mean(word_errors, axis=-1, keepdims=True)
    return jnp.sum(p_hat * (word_errors - w_hat), axis=-1)
