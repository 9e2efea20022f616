"""Blockwise (flash-style) attention for the long-sequence STF regime.

The reference's Speech-Transformer runs plain O(T^2) attention with a
materialized [num_head, 2500, 2500] distance-penalty board
(reference: tfsr/model/attention.py:34-102, tfsr/helper/model_helper.py:
189-264). At WSJ lengths (T' up to 2500 post-subsampling frames) the
[B, H, T, T] weight tensor and its training residuals dominate HBM.

This implementation computes attention with the online-softmax recurrence
over key blocks (the flash-attention algorithm, expressed in pure XLA as a
``lax.scan`` so it fuses and rematerializes cleanly on TPU):

- live memory per step is [B, H, T, block_k] — T*block instead of T^2;
- the distance penalty is applied in CLOSED FORM per (query, key-block)
  tile (``-log1p(scale * clip(ceil((d - zero_width + 1)/stripe_width),
  0, n_stripes))``, the same values as the reference's board — see
  ops/attention_penalty.py) so no [T, T] board is ever materialized;
- attention dropout stays exact: tiles of unnormalized probabilities are
  dropped while the softmax denominator accumulates the undropped sum,
  which is algebraically identical to dropping the normalized weights
  (draws differ from the plain path; identically distributed);
- the -1e9 additive padding-mask semantics match the plain path, so fully
  padded queries degrade to a uniform distribution exactly like the
  reference's softmax over all -1e9 scores.

Equivalence to scaled_dot_product_attention is tested to float tolerance
in tests/test_blockwise_attention.py.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class PenaltyParams(NamedTuple):
    """Closed-form attention-penalty parameters (ops/attention_penalty.py)."""

    zero_width: int
    stripe_width: int
    scale: float
    n_stripes: int


def _tile_penalty(q_pos, k_pos, pen: PenaltyParams):
    d = jnp.abs(q_pos[:, None] - k_pos[None, :]).astype(jnp.float32)
    count = jnp.ceil((d - pen.zero_width + 1) / pen.stripe_width)
    count = jnp.clip(count, 0, pen.n_stripes)
    return jnp.log1p(count * pen.scale) * -1.0  # additive score term


def online_softmax_step(carry, q_scaled, q_pos, k_blk, v_blk, msk_blk,
                        k_pos, penalty, dropout_rng=None, dropout_rate=0.0,
                        drop_key=None):
    """One flash-attention accumulation step over a key block.

    The SINGLE implementation of the online-softmax recurrence, shared by
    blockwise_attention's scan body and ring_attention's per-shard loop
    (ops/ring_attention.py) — the two must stay bit-identical (the ring
    parity tests assert it), so the math lives in one place.

    carry: (m_run [B,H,Q], l_run [B,H,Q], acc [B,H,Q,D]) running max /
    denominator / numerator. Returns the updated carry.
    """
    m_run, l_run, acc = carry
    s = jnp.einsum("bhqd,bhkd->bhqk", q_scaled, k_blk,
                   preferred_element_type=jnp.float32)
    if penalty is not None:
        s = s + _tile_penalty(q_pos, k_pos, penalty)[None, None]
    s = s + msk_blk.astype(jnp.float32) * -1e9
    m_new = jnp.maximum(m_run, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_run - m_new)
    p = jnp.exp(s - m_new[..., None])
    l_run = l_run * alpha + jnp.sum(p, axis=-1)
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(
            jax.random.fold_in(dropout_rng, drop_key),
            1.0 - dropout_rate, p.shape,
        )
        p_use = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    else:
        p_use = p
    acc = acc * alpha[..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", p_use, v_blk,
        preferred_element_type=jnp.float32,
    )
    return m_new, l_run, acc


def blockwise_attention(query, key, value, mask=None,
                        penalty: Optional[PenaltyParams] = None,
                        block_k: int = 256, dropout_rate: float = 0.0,
                        dropout_rng=None):
    """Flash-style attention: softmax(QK^T/sqrt(d) + pen + mask*-1e9) V.

    Args:
        query/key/value: [B, H, T, D] (post head-split).
        mask: [B, 1, 1, T] additive padding mask (1 = padded), matching
            scaled_dot_product_attention's convention.
        penalty: closed-form distance-penalty params or None.
        block_k: key-block size (T is padded up to a multiple; padded keys
            are masked out).
        dropout_rate/dropout_rng: attention-weight dropout (train mode).
    Returns [B, H, T, D]. (No weight tensor — use the plain path when
    attention maps are needed for plotting.)
    """
    batch, heads, seq_len, depth = query.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32))

    pad_k = (-seq_len) % block_k
    total_k = seq_len + pad_k
    n_blocks = total_k // block_k

    kv_mask = jnp.zeros((batch, 1, 1, seq_len), jnp.float32)
    if mask is not None:
        kv_mask = mask.astype(jnp.float32)
    if pad_k:
        key = jnp.pad(key, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        value = jnp.pad(value, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, 0), (0, 0), (0, pad_k)),
                          constant_values=1.0)

    # [n_blocks, ...] key-major stacks for the scan
    k_blocks = jnp.moveaxis(
        key.reshape(batch, heads, n_blocks, block_k, depth), 2, 0
    )
    v_blocks = jnp.moveaxis(
        value.reshape(batch, heads, n_blocks, block_k, depth), 2, 0
    )
    m_blocks = jnp.moveaxis(
        kv_mask.reshape(batch, 1, 1, n_blocks, block_k), 3, 0
    )
    q_pos = jnp.arange(seq_len)
    q_scaled = query.astype(jnp.float32) * scale

    def body(carry, x):
        k_blk, v_blk, msk_blk, blk_idx = x
        k_pos = blk_idx * block_k + jnp.arange(block_k)
        carry = online_softmax_step(
            carry, q_scaled, q_pos, k_blk, v_blk, msk_blk, k_pos, penalty,
            dropout_rng=dropout_rng, dropout_rate=dropout_rate,
            drop_key=blk_idx,
        )
        return carry, None

    m0 = jnp.full((batch, heads, seq_len), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((batch, heads, seq_len), jnp.float32)
    acc0 = jnp.zeros((batch, heads, seq_len, depth), jnp.float32)
    (m_fin, l_fin, acc), _ = jax.lax.scan(
        jax.checkpoint(body), (m0, l0, acc0),
        (k_blocks, v_blocks, m_blocks, jnp.arange(n_blocks)),
    )
    out = acc / jnp.maximum(l_fin, 1e-30)[..., None]
    return out.astype(query.dtype)
