"""Reference-TF-checkpoint EXPORT tool (srf_tpu/tools/export_tf_ckpt.py).

The mirror of tests/test_import_tf_ckpt.py: a randomly-initialized model of
OURS is saved as an orbax checkpoint, exported through the CLI into the
reference's ``tf.train.Checkpoint(optimizer, model)`` object graph, a FRESH
reference model restores that TF checkpoint natively, and its forward
logits must match our model's — two-way migration closes.
"""

import os
import sys

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

from tests.test_tf_parity import _Log, _ref_config  # noqa: F401

VOCAB_TOKENS = ["<PADDING_SYMBOL>", "a", "b", "c", "d", "$", "@"]


def _write_vocab(tmp_path):
    vocab = tmp_path / "tiny.vocab"
    vocab.write_text("".join(t + "\n" for t in VOCAB_TOKENS))
    return vocab


def _save_ours(tmp_path, cfg_argv, epoch=3):
    """Init our model from the CLI flag set and save an orbax checkpoint;
    returns (our logits on a fixed input, feats, inp_len)."""
    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.models.registry import build_model
    from srf_tpu.train.optimizer import get_optimizer
    from srf_tpu.trainer_sr import state_template, state_to_tree
    from srf_tpu.utils.checkpoint import CheckpointManager

    logger = Logger(name="exptest", level=Logger.INFO).logger
    config = ParseOption(cfg_argv, logger, is_print_opts=False).args
    tx, _ = get_optimizer(config)
    model, _ = build_model(config, len(VOCAB_TOKENS) + 1, logger)
    template = state_template(model, config, tx, jax.random.PRNGKey(7))
    manager = CheckpointManager(config.path_ckpt)
    manager.save(epoch, state_to_tree(template))
    manager.close()

    rng = np.random.RandomState(5)
    feats = rng.randn(2, 20, config.feat_dim).astype(np.float32)
    inp_len = np.array([20, 15], np.float32)
    ours = model.apply(
        {"params": template.params, "batch_stats": template.batch_stats},
        jnp.asarray(feats), jnp.asarray(inp_len, jnp.int32), False,
    )
    return np.asarray(ours), feats, inp_len, config


def _base_argv(tmp_path, extra):
    return [
        "prog",
        "--path-base=%s" % str(tmp_path),
        "--path-vocab=tiny.vocab",
        "--path-ckpt=%s" % str(tmp_path / "ours"),
        "--feat-dim=12",
        "--model-initializer=glorot_uniform",
        "--train-inp-dropout=0.0", "--train-inn-dropout=0.0",
        "--train-opti-type=adam", "--train-lr-param-k=0.001",
    ] + extra


def _export(tmp_path, cfg_argv):
    from srf_tpu.tools.export_tf_ckpt import main as export_main

    dst = str(tmp_path / "exported_tf")
    export_main(cfg_argv + [
        "--tpu-export-dst=%s" % dst,
        "--tpu-export-ref-repo=/root/reference",
    ])
    return dst


def _restore_reference(ref, dst):
    opt = tf.keras.optimizers.Adam()
    ckpt = tf.train.Checkpoint(optimizer=opt, model=ref)
    latest = tf.train.latest_checkpoint(dst)
    assert latest, "no exported checkpoint under %s" % dst
    status = ckpt.restore(latest)
    status.expect_partial()  # fresh optimizer slots are not in the ckpt
    return status


@pytest.mark.parametrize("flavor", ["naive", "einsum", "lowmemory"])
def test_export_srf_roundtrip(tmp_path, flavor):
    _write_vocab(tmp_path)
    argv = _base_argv(tmp_path, [
        "--model-type=srf", "--model-caps-type=%s" % flavor,
        "--model-caps-context=True", "--model-encoder-num=3",
        "--model-caps-primary-num=6", "--model-caps-primary-dim=4",
        "--model-caps-convolution-num=5", "--model-caps-convolution-dim=4",
        "--model-caps-class-dim=4", "--model-caps-iter=1",
        "--model-caps-window-lpad=1", "--model-caps-window-rpad=1",
        "--model-conv-layer-num=2", "--model-conv-filter-num=4",
    ])
    ours, feats, inp_len, _ = _save_ours(tmp_path, argv)
    dst = _export(tmp_path, argv)

    if flavor == "einsum":
        from tfsr.model.sequence_router_einsum import SequenceRouter as Ref
    elif flavor == "lowmemory":
        from tfsr.model.sequence_router_lowmemory import (
            SequenceRouter as Ref,
        )
    else:
        from tfsr.model.sequence_router_naive import SequenceRouter as Ref
    config = _ref_config(model_caps_context=True)
    ref = Ref(config, _Log(), class_n=8)
    fwd = tf.function(
        lambda f, l: ref.call(f, input_lengths=l, training=False)
    )
    fwd(tf.constant(feats), tf.constant(inp_len))  # build vars
    _restore_reference(ref, dst)
    ref_out = fwd(tf.constant(feats), tf.constant(inp_len)).numpy()
    np.testing.assert_allclose(ref_out, ours, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_export_lstm_roundtrip(tmp_path, bidirectional):
    import types

    _write_vocab(tmp_path)
    mtype = "blstm" if bidirectional else "lstm"
    argv = _base_argv(tmp_path, [
        "--model-type=%s" % mtype, "--model-encoder-num=2",
        "--model-dimension=8", "--model-lstm-is-cnnfe=False",
    ])
    ours, feats, inp_len, _ = _save_ours(tmp_path, argv)
    dst = _export(tmp_path, argv)

    from tfsr.model.lstm_encoder import LstmEncoder as RefLstm

    config = types.SimpleNamespace(
        model_encoder_num=2, model_dimension=8, train_inp_dropout=0.0,
        train_inn_dropout=0.0, model_initializer="glorot_uniform",
        model_type=mtype, model_conv_stride=2, model_conv_layer_num=2,
        model_conv_filter_num=4, feat_dim=12, model_lstm_is_cnnfe=False,
    )
    ref = RefLstm(config, vocab_n=8)
    ref.call(tf.constant(feats), input_lengths=tf.constant(inp_len),
             training=False)
    _restore_reference(ref, dst)
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len),
        training=False,
    ).numpy()
    np.testing.assert_allclose(ref_out, ours, rtol=2e-3, atol=2e-4)


def test_export_cnn_stride_roundtrip(tmp_path):
    import types

    _write_vocab(tmp_path)
    argv = _base_argv(tmp_path, [
        "--model-type=cnn", "--model-encoder-num=6",
        "--model-conv-inp-nfilt=8", "--model-conv-inn-nfilt=12",
        "--model-conv-proj-num=3", "--model-conv-proj-dim=24",
        "--model-conv-is-mp=False",
        "--model-conv-layer-num=2", "--model-conv-filter-num=4",
    ])
    ours, feats, inp_len, _ = _save_ours(tmp_path, argv)
    dst = _export(tmp_path, argv)

    from tfsr.model.cnn_stride_encoder import CNNStrideEncoder as RefCNN

    config = types.SimpleNamespace(
        model_initializer="glorot_uniform", model_encoder_num=6,
        model_conv_inp_nfilt=8, model_conv_inn_nfilt=12,
        model_conv_proj_num=3, model_conv_proj_dim=24,
        model_conv_stride=2, model_conv_layer_num=2,
        model_conv_filter_num=4, feat_dim=12,
        train_inn_dropout=0.0, train_inp_dropout=0.0,
    )
    ref = RefCNN(config, _Log(), class_n=8)
    ref.call(tf.constant(feats), input_lengths=tf.constant(inp_len),
             training=False)
    _restore_reference(ref, dst)
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len),
        training=False,
    ).numpy()
    np.testing.assert_allclose(ref_out, ours, rtol=2e-3, atol=2e-4)


def test_export_stf_roundtrip(tmp_path):
    _write_vocab(tmp_path)
    argv = _base_argv(tmp_path, [
        "--model-type=stf", "--model-encoder-num=2",
        "--model-dimension=16", "--model-att-head-num=4",
        "--model-inner-dim=32",
        "--model-conv-layer-num=2", "--model-conv-filter-num=4",
    ])

    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.models.registry import build_model, stf_in_len_div
    from srf_tpu.ops.masking import get_padding_bias
    from srf_tpu.train.optimizer import get_optimizer
    from srf_tpu.trainer_sr import state_template, state_to_tree
    from srf_tpu.utils.checkpoint import CheckpointManager

    logger = Logger(name="exptest", level=Logger.INFO).logger
    config = ParseOption(argv, logger, is_print_opts=False).args
    tx, _ = get_optimizer(config)
    model, div = build_model(config, 8, logger)
    template = state_template(model, config, tx, jax.random.PRNGKey(7))
    manager = CheckpointManager(config.path_ckpt)
    manager.save(3, state_to_tree(template))
    manager.close()

    rng = np.random.RandomState(5)
    feats = rng.randn(2, 20, 12).astype(np.float32)
    inp_len = np.array([20, 13], np.float32)
    mask_j = get_padding_bias(
        jnp.asarray(inp_len, jnp.int32), -(-feats.shape[1] // div), div
    )
    ours = np.asarray(model.apply(
        {"params": template.params, "batch_stats": template.batch_stats},
        jnp.asarray(feats), jnp.asarray(inp_len, jnp.int32), False,
        mask_j, None, div,
    ))
    dst = _export(tmp_path, argv)

    from tfsr.trainer_tf import ConvEncoder as RefSTF

    ref = RefSTF(
        num_layers=2, d_model=16, num_heads=4, dff=32, feat_dim=12,
        input_dropout=0.0, inner_dropout=0.0, residual_dropout=0.0,
        attention_dropout=0.0, nfilt=4, cnn_n=2, init="glorot_uniform",
        vocab_n=8,
    )
    mask = np.asarray(get_padding_bias(
        jnp.asarray(inp_len, jnp.int32), -(-feats.shape[1] // div), div
    ))

    def fwd():
        return ref.call(
            tf.constant(feats), input_lengths=tf.constant(inp_len),
            is_training=False, mask=tf.constant(mask),
            attention_penalty_mask=None, in_len_div=div,
        ).numpy()

    fwd()  # build vars
    _restore_reference(ref, dst)
    np.testing.assert_allclose(fwd(), ours, rtol=2e-3, atol=2e-4)


def test_export_cnn_maxpool_roundtrip(tmp_path):
    import types

    _write_vocab(tmp_path)
    argv = _base_argv(tmp_path, [
        "--model-type=cnn", "--model-encoder-num=6",
        "--model-conv-inp-nfilt=8", "--model-conv-inn-nfilt=12",
        "--model-conv-proj-num=3", "--model-conv-proj-dim=24",
        "--model-conv-is-mp=True", "--model-conv-stride=2",
        "--model-conv-layer-num=2", "--model-conv-filter-num=4",
    ])
    ours, feats, inp_len, _ = _save_ours(tmp_path, argv)
    dst = _export(tmp_path, argv)

    from tfsr.model.cnn_encoder import CNNEncoder as RefCNN

    config = types.SimpleNamespace(
        model_initializer="glorot_uniform", model_encoder_num=6,
        model_conv_inp_nfilt=8, model_conv_inn_nfilt=12,
        model_conv_proj_num=3, model_conv_proj_dim=24,
        model_conv_stride=2, model_conv_layer_num=2,
        model_conv_filter_num=4, feat_dim=12,
        train_inn_dropout=0.0, train_inp_dropout=0.0,
    )
    ref = RefCNN(config, _Log(), class_n=8)
    ref.call(tf.constant(feats), input_lengths=tf.constant(inp_len),
             training=False)
    _restore_reference(ref, dst)
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len),
        training=False,
    ).numpy()
    np.testing.assert_allclose(ref_out, ours, rtol=2e-3, atol=2e-4)
