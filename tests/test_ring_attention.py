"""Ring (sequence-parallel) attention vs the single-device paths.

Runs on the 8-virtual-CPU-device mesh (conftest): the time axis is sharded
8 ways, K/V rotate via ppermute, and values AND gradients must match the
single-device blockwise/plain attention.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srf_tpu.models.layers import scaled_dot_product_attention
from srf_tpu.ops.blockwise_attention import PenaltyParams, blockwise_attention
from srf_tpu.ops.ring_attention import ring_attention

KEY = jax.random.PRNGKey(0)


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip("needs %d devices" % n)
    return jax.make_mesh((n,), ("seq",), devices=devs[:n])


def _qkv(rng, batch=2, heads=2, seq=64, depth=4):
    q = rng.randn(batch, heads, seq, depth).astype(np.float32)
    k = rng.randn(batch, heads, seq, depth).astype(np.float32)
    v = rng.randn(batch, heads, seq, depth).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def _mask(batch, seq, valid):
    m = np.zeros((batch, 1, 1, seq), np.float32)
    for b, n in enumerate(valid):
        m[b, :, :, n:] = 1.0
    return jnp.asarray(m)


def test_ring_matches_blockwise_values():
    mesh = _mesh()
    rng = np.random.RandomState(0)
    q, k, v = _qkv(rng)
    mask = _mask(2, 64, [64, 41])
    pen = PenaltyParams(zero_width=2, stripe_width=4, scale=0.3, n_stripes=5)
    ring = ring_attention(q, k, v, mesh, mask=mask, penalty=pen)
    block = blockwise_attention(q, k, v, mask=mask, penalty=pen, block_k=16)
    np.testing.assert_allclose(
        np.asarray(ring), np.asarray(block), atol=2e-5
    )


def test_ring_matches_plain_attention():
    """No penalty, ragged mask: vs the reference-semantics dense path."""
    mesh = _mesh()
    rng = np.random.RandomState(1)
    q, k, v = _qkv(rng, batch=3, heads=1, seq=32, depth=8)
    mask = _mask(3, 32, [32, 17, 8])
    ring = ring_attention(q, k, v, mesh, mask=mask)
    plain, _ = scaled_dot_product_attention(
        q, k, v, mask, attention_dropout=0.0, att_pen_mask=None
    )
    np.testing.assert_allclose(
        np.asarray(ring), np.asarray(plain), atol=2e-5
    )


def test_ring_gradients_match_blockwise():
    mesh = _mesh()
    rng = np.random.RandomState(2)
    q, k, v = _qkv(rng, seq=32)
    mask = _mask(2, 32, [32, 25])
    pen = PenaltyParams(zero_width=1, stripe_width=2, scale=0.5, n_stripes=4)

    def loss_ring(q, k, v):
        out = ring_attention(q, k, v, mesh, mask=mask, penalty=pen)
        return jnp.sum(out * out)

    def loss_block(q, k, v):
        out = blockwise_attention(q, k, v, mask=mask, penalty=pen, block_k=8)
        return jnp.sum(out * out)

    with jax.set_mesh(mesh):
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_block = jax.grad(loss_block, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_block):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_stf_encoder_ring_matches_blockwise():
    """Full ConvEncoder under attention_impl='ring' (time sharded 8-way,
    dp x sp not needed here) must reproduce the single-device blockwise
    logits with shared params."""
    from srf_tpu.models.stf import ConvEncoder
    from srf_tpu.ops.attention_penalty import AttentionPenalty
    from srf_tpu.ops.masking import get_padding_bias

    mesh = _mesh()
    ap = AttentionPenalty(max_len=100, num_head=2, zero_width=2,
                          stripe_width=4, scale=0.3)
    pen = PenaltyParams(2, 4, 0.3, ap.n_stripes)
    kw = dict(
        num_layers=2, d_model=16, num_heads=2, dff=32, feat_dim=12,
        vocab_n=9, input_dropout=0.0, inner_dropout=0.0,
        residual_dropout=0.0, attention_dropout=0.0, nfilt=4, cnn_n=2,
        init_name="glorot_uniform", penalty_params=pen,
    )
    block = ConvEncoder(**kw, attention_impl="blockwise")
    ring = ConvEncoder(**kw, attention_impl="ring", mesh=mesh)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(2, 128, 12).astype(np.float32))
    lens = jnp.asarray([128, 70])
    mask = get_padding_bias(lens, 32, 4)  # T' = 128/4 = 32, 8-divisible
    variables = block.init(
        {"params": KEY, "dropout": KEY}, feats, lens, False, mask, None, 4
    )
    out_b = block.apply(variables, feats, lens, False, mask, None, 4)
    out_r = ring.apply(variables, feats, lens, False, mask, None, 4)
    np.testing.assert_allclose(
        np.asarray(out_r), np.asarray(out_b), atol=3e-5
    )


def test_ring_rejects_indivisible_seq():
    mesh = _mesh()
    rng = np.random.RandomState(3)
    q, k, v = _qkv(rng, seq=30)
    with pytest.raises(ValueError):
        ring_attention(q, k, v, mesh)
