"""Length masks and attention biases.

Parity targets (reference: tfsr/helper/model_helper.py):
- :func:`feat_mask` / :func:`feat_mask2` zero padded frames after conv /
  projection layers via a ``ceil(len/div)`` sequence mask
  (reference: model_helper.py:125-153),
- :func:`get_padding_bias` builds the [B,1,1,T'] attention bias that is 1 at
  padding (multiplied by -1e9 inside attention)
  (reference: model_helper.py:79-98, tfsr/model/attention.py:86),
- look-ahead / combined masks for decoder parity
  (reference: model_helper.py:101-122).

All functions are jittable with static shapes; masks derive from length
vectors, never from data-dependent shapes.
"""

import jax.numpy as jnp


def sequence_mask(lengths, maxlen, dtype=jnp.float32):
    """[B] lengths -> [B, maxlen] 1/0 mask."""
    positions = jnp.arange(maxlen)[None, :]
    return (positions < lengths[:, None]).astype(dtype)


def subsampled_lengths(lengths, divisor):
    """ceil(len / divisor), matching the reference's conv-subsample math."""
    return jnp.ceil(lengths.astype(jnp.float32) / divisor).astype(jnp.int32)


def feat_mask(x, lengths, divisor):
    """Zero padded frames of a 4-D [B, T, F, C] tensor."""
    mask = sequence_mask(subsampled_lengths(lengths, divisor), x.shape[1], x.dtype)
    return x * mask[:, :, None, None]


def feat_mask2(x, lengths, divisor):
    """Zero padded frames of a 3-D [B, T, D] tensor."""
    mask = sequence_mask(subsampled_lengths(lengths, divisor), x.shape[1], x.dtype)
    return x * mask[:, :, None]


def get_padding_bias(inp_len, maxlen, strides=4, dtype=jnp.float32):
    """[B,1,1,T'] tensor: 0 at valid frames, 1 at padding."""
    lengths = subsampled_lengths(inp_len, strides)
    mask = sequence_mask(lengths, maxlen, dtype)
    return (1.0 - mask)[:, None, None, :]


def create_padding_mask(seq, dtype=jnp.float32):
    """[B,1,1,L] mask: 1 where token id == 0 (padding)."""
    return (seq == 0).astype(dtype)[:, None, None, :]


def create_look_ahead_mask(size, dtype=jnp.float32):
    """[L,L] upper-triangular mask of future positions."""
    return 1.0 - jnp.tril(jnp.ones((size, size), dtype))


def create_combined_mask(tar):
    look_ahead = create_look_ahead_mask(tar.shape[1])
    padding = create_padding_mask(tar)
    return jnp.maximum(padding, look_ahead)
