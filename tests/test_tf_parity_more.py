"""Weight-transplant parity vs the reference: STF, LSTM, CNN encoders."""

import os
import sys
import types

import numpy as np
import pytest

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
tf = pytest.importorskip("tensorflow")
try:
    import tf_keras  # noqa: F401
except ImportError:
    pytest.skip("legacy keras shim unavailable", allow_module_level=True)

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from tests.test_tf_parity import (  # noqa: E402
    _Log,
    _convfe_batch_stats,
    _copy_convfe_weights,
)

KEY = jax.random.PRNGKey(0)


def _dense(layer):
    weights = layer.get_weights()
    if len(weights) == 2:
        return {"kernel": jnp.asarray(weights[0]), "bias": jnp.asarray(weights[1])}
    return {"kernel": jnp.asarray(weights[0])}


def _ln(layer):
    gamma, beta = layer.get_weights()
    return {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}


def test_stf_encoder_matches_reference():
    from tfsr.trainer_tf import ConvEncoder as RefEncoder

    from srf_tpu.models.stf import ConvEncoder
    from srf_tpu.ops.masking import get_padding_bias

    ref = RefEncoder(
        num_layers=2, d_model=16, num_heads=4, dff=32, feat_dim=12,
        input_dropout=0.0, inner_dropout=0.0, residual_dropout=0.0,
        attention_dropout=0.0, nfilt=4, cnn_n=2, init="glorot_uniform",
        vocab_n=9,
    )
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 20, 12).astype(np.float32)
    inp_len = np.array([20, 13], np.float32)
    tf_mask = np.asarray(
        get_padding_bias(jnp.asarray(inp_len, jnp.int32), 5, 4)
    )
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len),
        is_training=False, mask=tf.constant(tf_mask),
        attention_penalty_mask=None, in_len_div=4,
    ).numpy()

    model = ConvEncoder(
        num_layers=2, d_model=16, num_heads=4, dff=32, feat_dim=12,
        vocab_n=9, input_dropout=0.0, inner_dropout=0.0,
        residual_dropout=0.0, attention_dropout=0.0, nfilt=4, cnn_n=2,
        init_name="glorot_uniform",
    )
    mask = jnp.asarray(tf_mask)
    variables = model.init(
        {"params": KEY, "dropout": KEY}, jnp.asarray(feats),
        jnp.asarray(inp_len, jnp.int32), False, mask, None, 4,
    )
    params = dict(variables["params"])
    params["conv"] = _copy_convfe_weights(ref.conv, params["conv"], 2)
    batch_stats = {"conv": _convfe_batch_stats(ref.conv, 2)}
    params["linear_projection"] = _dense(ref.linear_projection)
    params["ln"] = _ln(ref.layernorm)
    params["proj"] = _dense(ref.proj)
    for i, blk in enumerate(ref.enc_layers):
        params["enc%d" % i] = {
            "ln_cur": _ln(blk.layernorm_cur),
            "ln_res": _ln(blk.layernorm_res),
            "mha": {
                "wq": _dense(blk.mha.dense_layer_for_query),
                "wk": _dense(blk.mha.dense_layer_for_key),
                "wv": _dense(blk.mha.dense_layer_for_value),
                "wo": _dense(blk.mha.dense),
            },
            "ffn": {
                "ff1": _dense(blk.ffn.ff_relu),
                "ff2": _dense(blk.ffn.ff_proj),
            },
        }
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(feats),
        jnp.asarray(inp_len, jnp.int32), False, mask, None, 4,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-4)


def _copy_keras_lstm(keras_lstm, units):
    """Keras fused LSTM weights -> flax OptimizedLSTMCell param dict.

    Keras gate order is [i | f | c | o]; flax names them i/f/g/o with split
    input (i*) and hidden (h*) kernels, bias on the hidden ones.
    """
    kernel, recurrent, bias = keras_lstm.get_weights()
    out = {}
    for idx, gate in enumerate(["i", "f", "g", "o"]):
        sl = slice(idx * units, (idx + 1) * units)
        out["i" + gate] = {"kernel": jnp.asarray(kernel[:, sl])}
        out["h" + gate] = {
            "kernel": jnp.asarray(recurrent[:, sl]),
            "bias": jnp.asarray(bias[sl]),
        }
    return out


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_encoder_matches_reference(bidirectional):
    from tfsr.model.lstm_encoder import LstmEncoder as RefLstm

    from srf_tpu.models.lstm import LstmEncoder

    units = 8
    config = types.SimpleNamespace(
        model_encoder_num=2, model_dimension=units, train_inp_dropout=0.0,
        train_inn_dropout=0.0, model_initializer="glorot_uniform",
        model_type="blstm" if bidirectional else "lstm",
        model_conv_stride=2, model_conv_layer_num=2, model_conv_filter_num=4,
        feat_dim=12, model_lstm_is_cnnfe=False,
    )
    ref = RefLstm(config, vocab_n=9)
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 14, 12).astype(np.float32)
    inp_len = np.array([14, 10], np.float32)
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len), training=False
    ).numpy()

    model = LstmEncoder(
        num_layers=2, d_model=units, vocab_n=9, feat_dim=12,
        bidirectional=bidirectional, input_dropout=0.0, inner_dropout=0.0,
        init_name="glorot_uniform", is_cnnfe=False,
    )
    variables = model.init(
        {"params": KEY, "dropout": KEY}, jnp.asarray(feats),
        jnp.asarray(inp_len, jnp.int32), False,
    )
    params = dict(variables["params"])
    for idx in range(2):
        ref_layer = ref.enc_layers[idx]
        if bidirectional:
            params["lstm%d_f" % idx] = _copy_keras_lstm(
                ref_layer.forward_layer, units
            )
            params["lstm%d_b" % idx] = _copy_keras_lstm(
                ref_layer.backward_layer, units
            )
        else:
            params["lstm%d_f" % idx] = _copy_keras_lstm(ref_layer, units)
        params["ln%d" % idx] = _ln(ref.layernorms[idx])
    params["proj"] = _dense(ref.proj)
    params["ln_out"] = _ln(ref.ln)
    out = model.apply(
        {"params": params}, jnp.asarray(feats),
        jnp.asarray(inp_len, jnp.int32), False,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-4)


def test_cnn_stride_encoder_matches_reference():
    from tfsr.model.cnn_stride_encoder import CNNStrideEncoder as RefCNN

    from srf_tpu.models.cnn import CNNStrideEncoder

    config = types.SimpleNamespace(
        model_initializer="glorot_uniform", model_encoder_num=6,
        model_conv_inp_nfilt=8, model_conv_inn_nfilt=12,
        model_conv_proj_num=3, model_conv_proj_dim=24,
        model_conv_stride=2, model_conv_layer_num=2,
        model_conv_filter_num=4, feat_dim=12,
        train_inn_dropout=0.0, train_inp_dropout=0.0,
    )
    ref = RefCNN(config, _Log(), class_n=9)
    rng = np.random.RandomState(2)
    feats = rng.randn(2, 16, 12).astype(np.float32)
    inp_len = np.array([16, 11], np.float32)
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len), training=False
    ).numpy()

    model = CNNStrideEncoder(
        enc_num=6, class_n=9, feat_dim=12, nfilt_inp=8, nfilt_inn=12,
        proj_layers=3, proj_dim=24, conv_layer_num=2, conv_filter_num=4,
        input_dropout=0.0, inner_dropout=0.0, init_name="glorot_uniform",
    )
    variables = model.init(
        {"params": KEY, "dropout": KEY}, jnp.asarray(feats),
        jnp.asarray(inp_len, jnp.int32), False,
    )
    params = dict(variables["params"])
    params["conv_feat"] = _copy_convfe_weights(
        ref.cnn_fe, params["conv_feat"], 2
    )
    batch_stats = {"conv_feat": _convfe_batch_stats(ref.cnn_fe, 2)}
    body = dict(params["body"])
    for idx in range(6):
        body["conv%d" % idx] = _dense(ref.enc_layers[idx])
        body["ln%d" % idx] = _ln(ref.layernorms[idx])
    for idx in range(2):
        body["proj%d" % idx] = _dense(ref.proj[idx].layer)
        body["proj_ln%d" % idx] = _ln(ref.layernorms_proj[idx])
    body["projv"] = _dense(ref.projv.layer)
    body["projv_ln"] = _ln(ref.layernorms_projv)
    params["body"] = body
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(feats),
        jnp.asarray(inp_len, jnp.int32), False,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-4)


def test_srf_einsum_flavor_matches_reference():
    """The einsum flavor adds pos-enc + sqrt scaling to the bottleneck
    (reference: sequence_router_einsum.py:130-131) and uses eps=1e-9 in the
    output length."""
    from tfsr.model.sequence_router_einsum import SequenceRouter as RefSRF

    from srf_tpu.models.srf import SequenceRouter
    from tests.test_tf_parity import _ref_config

    config = _ref_config(model_caps_context=True)
    ref = RefSRF(config, _Log(), class_n=8)
    rng = np.random.RandomState(5)
    feats = rng.randn(2, 20, 12).astype(np.float32)
    inp_len = np.array([20, 14], np.float32)
    # the einsum variant's TensorArray requires graph mode in this TF
    ref_out = tf.function(
        lambda f, l: ref.call(f, input_lengths=l, training=False)
    )(tf.constant(feats), tf.constant(inp_len)).numpy()

    model = SequenceRouter(
        feat_dim=12, class_n=8, enc_num=3, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4, caps_class_dim=4,
        caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=4, caps_type="einsum",
        inp_dropout=0.0, inn_dropout=0.0, init_name="glorot_uniform",
    )
    import jax

    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key}, jnp.asarray(feats),
        jnp.asarray(inp_len, jnp.int32), False,
    )
    params = dict(variables["params"])
    params["conv_feat"] = _copy_convfe_weights(ref.conv, params["conv_feat"], 2)
    batch_stats = {"conv_feat": _convfe_batch_stats(ref.conv, 2)}
    params["flatten"] = _dense(ref.proj_pe)
    for i in range(2):
        params["encaps%d" % (i + 1)] = _dense(ref.ecs[i])
    params["ln_input"] = _ln(ref.ln_i)
    for i in range(3):
        params["ln_mid%d" % (i + 1)] = _ln(ref.ln_m[i])
    params["ln_output"] = _ln(ref.ln_o)
    for i in range(3):
        params["W%d" % i] = jnp.asarray(ref.wgt[i].numpy())
        params["b%d" % i] = jnp.asarray(ref.bias[i].numpy()[0, 0])
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(feats),
        jnp.asarray(inp_len, jnp.int32), False,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=5e-4)
