"""Model zoo shape/behavior tests (port of the reference's module self-tests:
attention.py:176-233 fixtures, block.py:213-235 and feed_forward.py:42-50
shape smoke tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srf_tpu.models.cnn import CNNEncoder, CNNStrideEncoder
from srf_tpu.models.layers import (
    EncoderBlock,
    MultiHeadAttention,
    PointWiseFeedForward,
    scaled_dot_product_attention,
)
from srf_tpu.models.lstm import LstmEncoder
from srf_tpu.models.srf import SequenceRouter
from srf_tpu.models.stf import ConvEncoder
from srf_tpu.ops.masking import get_padding_bias

KEY = jax.random.PRNGKey(0)


def test_scaled_dot_product_attention_fixture():
    """Fixture from reference attention.py:187-205: a query aligned with the
    second key returns the second value."""
    k = jnp.array([[10, 0, 0], [0, 10, 0], [0, 0, 10], [0, 0, 10]], jnp.float32)
    v = jnp.array([[1, 0], [10, 0], [100, 5], [1000, 6]], jnp.float32)
    q = jnp.array([[0, 10, 0]], jnp.float32)
    out, attn = scaled_dot_product_attention(q, k, v, None, 0, None)
    np.testing.assert_allclose(np.asarray(out), [[10.0, 0.0]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), [[0, 1, 0, 0]], atol=1e-6)
    # aligned with the repeated third/fourth key -> values averaged
    q2 = jnp.array([[0, 0, 10]], jnp.float32)
    out2, _ = scaled_dot_product_attention(q2, k, v, None, 0, None)
    np.testing.assert_allclose(np.asarray(out2), [[550.0, 5.5]], atol=1e-4)


def test_mha_shapes():
    mha = MultiHeadAttention(d_model=512, num_heads=8)
    x = jax.random.uniform(KEY, (1, 60, 512))
    v = mha.init({"params": KEY}, x, x, x, None, 0.0, None, False)
    out, attn = mha.apply(v, x, x, x, None, 0.0, None, False)
    assert out.shape == (1, 60, 512)
    assert attn.shape == (1, 8, 60, 60)


def test_encoder_block_shapes():
    blk = EncoderBlock(512, 8, 2048, 0.1, 0.1, 0.1)
    x = jax.random.uniform(KEY, (4, 43, 512))
    v = blk.init({"params": KEY}, x, None, None, False)
    assert blk.apply(v, x, None, None, False).shape == (4, 43, 512)


def test_ffn_shapes():
    ffn = PointWiseFeedForward(256, 2048, 0.1)
    x = jax.random.uniform(KEY, (4, 50, 33))
    v = ffn.init({"params": KEY}, x, False)
    assert ffn.apply(v, x, False).shape == (4, 50, 256)


@pytest.fixture(scope="module")
def batch():
    feats = jax.random.normal(KEY, (2, 40, 123))
    lens = jnp.array([40, 33])
    return feats, lens


def _init_apply(model, feats, lens, **kw):
    variables = model.init({"params": KEY, "dropout": KEY}, feats, lens, False, **kw)
    return model.apply(variables, feats, lens, False, **kw), variables


def test_srf_shapes_and_masking(batch):
    feats, lens = batch
    model = SequenceRouter(
        feat_dim=123, class_n=63, enc_num=3, caps_primary_num=8,
        caps_primary_dim=4, caps_conv_num=6, caps_conv_dim=4, caps_class_dim=4,
        caps_iter=1, lpad=1, rpad=1, is_context=True, conv_filter_num=16,
        caps_type="naive",
    )
    out, variables = _init_apply(model, feats, lens)
    assert out.shape == (2, 10, 63)
    assert np.isfinite(np.asarray(out)).all()
    # training mode mutates batch stats and uses dropout rng
    out_t, mutated = model.apply(
        variables, feats, lens, True, rngs={"dropout": KEY},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated


def test_srf_dr_einsum_flavor(batch):
    feats, lens = batch
    model = SequenceRouter(
        feat_dim=123, class_n=63, enc_num=2, caps_primary_num=8,
        caps_primary_dim=4, caps_conv_num=6, caps_conv_dim=4, caps_class_dim=4,
        caps_iter=2, lpad=0, rpad=0, is_context=False, conv_filter_num=16,
        caps_type="einsum",
    )
    out, _ = _init_apply(model, feats, lens)
    assert out.shape == (2, 10, 63)


def test_stf_shapes(batch):
    feats, lens = batch
    model = ConvEncoder(
        num_layers=2, d_model=32, num_heads=4, dff=64, feat_dim=123,
        vocab_n=63, nfilt=16,
    )
    mask = get_padding_bias(lens, 10, 4)
    out, _ = _init_apply(model, feats, lens, mask=mask,
                         attention_penalty_mask=None, in_len_div=4)
    assert out.shape == (2, 10, 63)


def test_lstm_shapes(batch):
    feats, lens = batch
    for bidi, cnnfe, t_out in [(True, True, 10), (False, False, 40)]:
        model = LstmEncoder(
            num_layers=2, d_model=16, vocab_n=63, feat_dim=123,
            bidirectional=bidi, is_cnnfe=cnnfe, conv_filter_num=8,
        )
        out, _ = _init_apply(model, feats, lens)
        assert out.shape == (2, t_out, 63)


def test_cnn_shapes(batch):
    feats, lens = batch
    mp = CNNEncoder(enc_num=6, class_n=63, feat_dim=123, nfilt_inp=16,
                    nfilt_inn=32, proj_dim=128)
    out, _ = _init_apply(mp, feats, lens)
    assert out.shape == (2, 10, 63)
    st = CNNStrideEncoder(enc_num=6, class_n=63, feat_dim=123, nfilt_inp=16,
                          nfilt_inn=32, proj_dim=128, conv_filter_num=8)
    out, _ = _init_apply(st, feats, lens)
    assert out.shape == (2, 10, 63)


def test_srf_padded_frames_do_not_affect_valid_logits(batch):
    """Static padding must not leak into valid frames: same utterance padded
    to different lengths yields identical valid-frame logits."""
    feats, _ = batch
    lens = jnp.array([33, 33])
    model = SequenceRouter(
        feat_dim=123, class_n=63, enc_num=2, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4, caps_class_dim=4,
        caps_iter=1, lpad=0, rpad=0, is_context=False, conv_filter_num=8,
        caps_type="naive",
    )
    base = feats[:1, :33]
    short = jnp.pad(base, ((0, 0), (0, 7), (0, 0)))   # T=40
    long = jnp.pad(base, ((0, 0), (0, 27), (0, 0)))   # T=60
    v = model.init({"params": KEY, "dropout": KEY}, short, lens[:1], False)
    out_short = model.apply(v, short, lens[:1], False)
    out_long = model.apply(v, long, lens[:1], False)
    valid = 9  # ceil(33/4) frames survive the 4x subsample
    np.testing.assert_allclose(
        np.asarray(out_short[:, :valid]), np.asarray(out_long[:, :valid]),
        atol=2e-5,
    )


@pytest.mark.parametrize(
    # (1,1,0) is the asymmetric window (left context, zero right pad) —
    # a distinct wavefront delay geometry; (1,0,0) is the window-1
    # degenerate case
    "caps_iter,lpad,rpad", [(1, 1, 1), (3, 2, 1), (1, 1, 0), (1, 0, 0)]
)
def test_srf_wavefront_equals_layered(batch, caps_iter, lpad, rpad):
    """The wavefront (whole-stack single-scan) SDR must match the layered
    per-layer scan: same param tree, same eval outputs, same gradients."""
    feats, lens = batch
    kw = dict(
        feat_dim=123, class_n=63, enc_num=4, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4, caps_class_dim=4,
        caps_iter=caps_iter, lpad=lpad, rpad=rpad, is_context=True,
        conv_filter_num=8, caps_type="naive",
    )
    layered = SequenceRouter(**kw)
    wavefront = SequenceRouter(**kw, routing_impl="wavefront")
    variables = layered.init({"params": KEY, "dropout": KEY}, feats, lens, False)
    v_wf = wavefront.init({"params": KEY, "dropout": KEY}, feats, lens, False)
    assert jax.tree.structure(variables) == jax.tree.structure(v_wf)

    out_l = layered.apply(variables, feats, lens, False)
    out_w = wavefront.apply(variables, feats, lens, False)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_w), atol=2e-5)

    def loss(model):
        def f(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, lens, False,
            )
            return jnp.sum(out * out)
        return f

    g_l = jax.grad(loss(layered))(variables["params"])
    g_w = jax.grad(loss(wavefront))(variables["params"])
    flat_l = jax.tree.leaves(g_l)
    flat_w = jax.tree.leaves(g_w)
    for a, b in zip(flat_l, flat_w):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=2e-4 + 1e-3 * float(jnp.max(jnp.abs(a))), rtol=0,
        )


@pytest.mark.parametrize("enc_num", [1, 2])
def test_srf_wavefront_degenerate_stacks(batch, enc_num):
    """enc_num=1 (single class layer) and enc_num=2 (no middle group) must
    still match the layered path."""
    feats, lens = batch
    kw = dict(
        feat_dim=123, class_n=63, enc_num=enc_num, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4, caps_class_dim=4,
        caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_filter_num=8, caps_type="naive",
    )
    layered = SequenceRouter(**kw)
    wavefront = SequenceRouter(**kw, routing_impl="wavefront")
    variables = layered.init({"params": KEY, "dropout": KEY}, feats, lens, False)
    out_l = layered.apply(variables, feats, lens, False)
    out_w = wavefront.apply(variables, feats, lens, False)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_w), atol=2e-5)


def test_srf_wavefront_training_mode_runs(batch):
    feats, lens = batch
    model = SequenceRouter(
        feat_dim=123, class_n=63, enc_num=3, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4, caps_class_dim=4,
        caps_iter=1, lpad=1, rpad=1, is_context=True, conv_filter_num=8,
        caps_type="naive", routing_impl="wavefront",
    )
    variables = model.init({"params": KEY, "dropout": KEY}, feats, lens, False)
    out, mutated = model.apply(
        variables, feats, lens, True, rngs={"dropout": KEY},
        mutable=["batch_stats"],
    )
    assert out.shape == (2, 10, 63)
    assert np.isfinite(np.asarray(out)).all()


def test_srf_from_config_forwards_stride():
    """The registry computes in_len_div from model_conv_stride; dropping
    the stride in from_config would silently mis-size every CTC length on
    non-default strides (review finding)."""
    import types

    from srf_tpu.models.srf import SequenceRouter

    config = types.SimpleNamespace(
        feat_dim=8, model_encoder_num=2, model_caps_primary_num=4,
        model_caps_primary_dim=4, model_caps_convolution_num=4,
        model_caps_convolution_dim=4, model_caps_class_dim=4,
        model_caps_iter=1, model_caps_window_lpad=1,
        model_caps_window_rpad=1, model_caps_context=True,
        model_conv_layer_num=2, model_conv_filter_num=4,
        train_inp_dropout=0.0, train_inn_dropout=0.0,
        model_initializer="glorot_uniform", model_caps_type="naive",
        model_conv_stride=3,
    )
    model = SequenceRouter.from_config(config, 6)
    assert model.stride == 3
