"""Blockwise attention must equal the plain path to float tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srf_tpu.models.layers import scaled_dot_product_attention
from srf_tpu.ops.attention_penalty import AttentionPenalty
from srf_tpu.ops.blockwise_attention import (
    PenaltyParams,
    blockwise_attention,
)

KEY = jax.random.PRNGKey(11)


def _qkv(rng, batch=2, heads=3, seq=50, depth=8):
    q = rng.randn(batch, heads, seq, depth).astype(np.float32)
    k = rng.randn(batch, heads, seq, depth).astype(np.float32)
    v = rng.randn(batch, heads, seq, depth).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("block_k", [16, 64])
@pytest.mark.parametrize("with_mask", [False, True])
def test_blockwise_matches_plain(block_k, with_mask):
    rng = np.random.RandomState(0)
    q, k, v = _qkv(rng)
    mask = None
    if with_mask:
        lens = jnp.asarray([50, 37])
        mask = 1.0 - (jnp.arange(50)[None] < lens[:, None]).astype(jnp.float32)
        mask = mask[:, None, None, :]
    want, _ = scaled_dot_product_attention(q, k, v, mask, 0.0, None)
    got = blockwise_attention(q, k, v, mask, block_k=block_k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_blockwise_penalty_matches_board():
    """The closed-form per-tile penalty must equal the reference board path
    (ops/attention_penalty.py) applied densely."""
    rng = np.random.RandomState(1)
    q, k, v = _qkv(rng, seq=40)
    ap = AttentionPenalty(max_len=100, num_head=3, zero_width=3,
                          stripe_width=5, scale=0.5)
    board = ap.penalty(40)  # [1, L, L]
    want, _ = scaled_dot_product_attention(q, k, v, None, 0.0,
                                           board[None])
    pen = PenaltyParams(zero_width=3, stripe_width=5, scale=0.5,
                        n_stripes=ap.n_stripes)
    got = blockwise_attention(q, k, v, penalty=pen, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_blockwise_gradients_match_plain():
    rng = np.random.RandomState(2)
    q, k, v = _qkv(rng, seq=30)

    def f_plain(q, k, v):
        out, _ = scaled_dot_product_attention(q, k, v, None, 0.0, None)
        return jnp.sum(out * out)

    def f_block(q, k, v):
        out = blockwise_attention(q, k, v, block_k=8)
        return jnp.sum(out * out)

    g_plain = jax.grad(f_plain, argnums=(0, 1, 2))(q, k, v)
    g_block = jax.grad(f_block, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_plain, g_block):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


def test_blockwise_dropout_mean_preserving():
    """Dropped-tile attention must stay an unbiased estimate: averaging
    many dropout draws approaches the no-dropout output."""
    rng = np.random.RandomState(3)
    q, k, v = _qkv(rng, batch=1, heads=1, seq=16, depth=4)
    base = blockwise_attention(q, k, v, block_k=8)
    keys = jax.vmap(lambda i: jax.random.fold_in(KEY, i))(jnp.arange(200))
    draws = jax.jit(jax.vmap(
        lambda key: blockwise_attention(
            q, k, v, block_k=8, dropout_rate=0.3, dropout_rng=key
        )
    ))(keys)  # one trace for all 200 draws (was 200 separate traces)
    mean = np.mean(np.asarray(draws), axis=0)
    np.testing.assert_allclose(mean, np.asarray(base), atol=0.15)


def test_stf_encoder_blockwise_matches_plain():
    """The whole ConvEncoder must produce identical logits under
    attention_impl='blockwise' (flash path, penalty from closed form) and
    'plain' (dense [T,T] board) with shared params."""
    from srf_tpu.models.stf import ConvEncoder
    from srf_tpu.ops.masking import get_padding_bias

    ap = AttentionPenalty(max_len=100, num_head=2, zero_width=2,
                          stripe_width=4, scale=0.3)
    pen = PenaltyParams(2, 4, 0.3, ap.n_stripes)
    kw = dict(
        num_layers=2, d_model=16, num_heads=2, dff=32, feat_dim=12,
        vocab_n=9, input_dropout=0.0, inner_dropout=0.0,
        residual_dropout=0.0, attention_dropout=0.0, nfilt=4, cnn_n=2,
        init_name="glorot_uniform", penalty_params=pen,
    )
    plain = ConvEncoder(**kw, attention_impl="plain")
    block = ConvEncoder(**kw, attention_impl="blockwise")
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(2, 40, 12).astype(np.float32))
    lens = jnp.asarray([40, 29])
    mask = get_padding_bias(lens, 10, 4)
    board = ap.penalty(10)[None]  # [1, 1, L, L] dense board for plain
    variables = plain.init(
        {"params": KEY, "dropout": KEY}, feats, lens, False, mask, board, 4
    )
    out_p = plain.apply(variables, feats, lens, False, mask, board, 4)
    out_b = block.apply(variables, feats, lens, False, mask, None, 4)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_p),
                               atol=3e-5)
