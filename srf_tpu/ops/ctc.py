"""CTC loss with the reference's blank-last convention.

The reference computes per-example CTC loss with ``tf.nn.ctc_loss(labels,
logits, tar_len, ceil(inp_len / in_len_div), logits_time_major=False,
blank_index=dec_in_dim)`` — the blank class is the *last* logit and label id
0 is a real class (the PAD symbol) (reference: tfsr/trainer_sr.py:64-66,
130-136). Padded label positions are identified by ``tar_len``, not by a
reserved id.

Here the loss is ``optax.ctc_loss`` with ``blank_id`` pointed at the last
class; logit frames beyond ``ceil(inp_len / in_len_div)`` and label slots
beyond ``tar_len`` are padding. Golden-tested against ``tf.nn.ctc_loss`` in
tests/test_ctc.py.

Global-batch loss scaling matches ``tf.nn.compute_average_loss(pe_loss,
global_batch_size=batch * n_replicas)`` (reference: trainer_sr.py:57-68):
the mean over the *global* batch, so data-parallel gradients psum to the
same value the reference's NCCL all-reduce produced.
"""

import jax.numpy as jnp
import optax

from srf_tpu.ops.masking import sequence_mask, subsampled_lengths


def ctc_loss(logits, logit_lengths, labels, label_lengths, blank_id=None):
    """Per-example CTC negative log-likelihood.

    Args:
        logits: [B, T, K] raw logits, blank class at index K-1 unless
            ``blank_id`` given.
        logit_lengths: [B] valid frame counts (already subsampled).
        labels: [B, L] dense labels, zero-padded (id 0 is a real class).
        label_lengths: [B] valid label counts.
    Returns:
        [B] loss vector.
    """
    if blank_id is None:
        blank_id = logits.shape[-1] - 1
    logit_paddings = 1.0 - sequence_mask(logit_lengths, logits.shape[1])
    label_paddings = 1.0 - sequence_mask(label_lengths, labels.shape[1])
    return optax.ctc_loss(
        logits, logit_paddings, labels, label_paddings, blank_id=blank_id
    )


def ctc_loss_from_frames(logits, inp_len, in_len_div, labels, tar_len,
                         blank_id=None):
    """Convenience wrapper using raw frame lengths and the conv divisor.

    Matches the reference's ``ceil(inp_len / in_len_div)`` length math
    (reference: trainer_sr.py:65).
    """
    logit_lengths = subsampled_lengths(inp_len, in_len_div)
    logit_lengths = jnp.minimum(logit_lengths, logits.shape[1])
    return ctc_loss(logits, logit_lengths, labels, tar_len, blank_id)
