"""Reference-TF-checkpoint import tool (srf_tpu/tools/import_tf_ckpt.py).

A tiny reference SRF is trained for nothing but its random init, saved the
way the reference trainers save (tf.train.Checkpoint(optimizer, model) —
tfsr/helper/misc_helper.py:139-143), imported through the CLI, and the
resulting orbax checkpoint must (a) restore through the trainer's own
template and (b) reproduce the reference model's forward logits.
"""

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

from tests.test_tf_parity import _Log, _ref_config

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("flavor", ["naive", "lowmemory", "einsum"])
def test_import_roundtrip_forward_parity(tmp_path, flavor):
    if flavor == "naive":
        from tfsr.model.sequence_router_naive import SequenceRouter as Ref
    elif flavor == "einsum":
        from tfsr.model.sequence_router_einsum import SequenceRouter as Ref
    else:
        from tfsr.model.sequence_router_lowmemory import SequenceRouter as Ref

    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.tools.import_tf_ckpt import main as import_main
    from srf_tpu.trainer_sr import state_template, state_to_tree, tree_to_state
    from srf_tpu.train.optimizer import get_optimizer
    from srf_tpu.utils.checkpoint import CheckpointManager

    config = _ref_config()
    ref = Ref(config, _Log(), class_n=8)
    rng = np.random.RandomState(3)
    feats = rng.randn(2, 20, 12).astype(np.float32)
    inp_len = np.array([20, 15], np.float32)
    # the einsum variant's TensorArray requires graph mode in this TF
    ref_out = tf.function(
        lambda f, l: ref.call(f, input_lengths=l, training=False)
    )(tf.constant(feats), tf.constant(inp_len)).numpy()

    opt = tf_keras.optimizers.legacy.Adam(1e-3)
    ckpt = tf.train.Checkpoint(optimizer=opt, model=ref)
    src_dir = str(tmp_path / "tf")
    ckpt.save(os.path.join(src_dir, "ckpt"))

    # vocab file: 7 tokens, BOS '@' last (dec_in_dim 7 -> class_n 8)
    vocab = tmp_path / "tiny.vocab"
    vocab.write_text("".join(t + "\n" for t in
                             ["<PADDING_SYMBOL>", "a", "b", "c", "d", "$", "@"]))

    out_ckpt = str(tmp_path / "imported")
    argv = [
        "prog",
        "--path-base=%s" % str(tmp_path),
        "--path-vocab=tiny.vocab",
        "--path-ckpt=%s" % out_ckpt,
        "--feat-dim=12",
        "--model-type=srf",
        "--model-caps-type=%s" % flavor,
        "--model-caps-context=True",
        "--model-encoder-num=3",
        "--model-caps-primary-num=6", "--model-caps-primary-dim=4",
        "--model-caps-convolution-num=5", "--model-caps-convolution-dim=4",
        "--model-caps-class-dim=4", "--model-caps-iter=1",
        "--model-caps-window-lpad=1", "--model-caps-window-rpad=1",
        "--model-conv-layer-num=2", "--model-conv-filter-num=4",
        "--model-initializer=glorot_uniform",
        "--train-inp-dropout=0.0", "--train-inn-dropout=0.0",
        "--train-opti-type=adam", "--train-lr-param-k=0.001",
        "--tpu-import-src=%s" % src_dir,
    ]
    import_main(argv)

    # restore through the trainer's own template and run our model
    cfg = types.SimpleNamespace(
        model_type="srf", model_caps_type=flavor, model_caps_context=True,
        model_encoder_num=3, model_caps_primary_num=6,
        model_caps_primary_dim=4, model_caps_convolution_num=5,
        model_caps_convolution_dim=4, model_caps_class_dim=4,
        model_caps_iter=1, model_caps_window_lpad=1,
        model_caps_window_rpad=1, model_conv_layer_num=2,
        model_conv_filter_num=4, model_conv_stride=2, feat_dim=12,
        model_initializer="glorot_uniform", train_inp_dropout=0.0,
        train_inn_dropout=0.0, model_caps_layer_time=None,
        train_opti_type="adam", train_lr_param_k=0.001,
        model_dimension=16, train_warmup_n=100, train_adam_beta1=0.9,
        train_adam_beta2=0.98, train_adam_epsilon=1e-9, train_max_lr=1e9,
        tpu_seed=1234,
    )
    from srf_tpu.models.registry import build_model

    tx, _ = get_optimizer(cfg)
    model, _ = build_model(cfg, 8, None)
    template = state_template(model, cfg, tx, jax.random.PRNGKey(1234))
    manager = CheckpointManager(out_ckpt)
    step = manager.latest_step()
    restored = tree_to_state(
        manager.restore(step, state_to_tree(template))
    )
    manager.close()

    ours = model.apply(
        {"params": restored.params, "batch_stats": restored.batch_stats},
        jnp.asarray(feats), jnp.asarray(inp_len.astype(np.int32)), False,
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref_out, atol=5e-5, rtol=1e-4
    )


def test_import_stf_forward_parity(tmp_path):
    from tfsr.trainer_tf import ConvEncoder as RefEncoder

    from srf_tpu.models.stf import ConvEncoder
    from srf_tpu.ops.masking import get_padding_bias
    from srf_tpu.tools.import_tf_ckpt import main as import_main
    from srf_tpu.utils.checkpoint import CheckpointManager

    ref = RefEncoder(
        num_layers=2, d_model=16, num_heads=4, dff=32, feat_dim=12,
        input_dropout=0.0, inner_dropout=0.0, residual_dropout=0.0,
        attention_dropout=0.0, nfilt=4, cnn_n=2, init="glorot_uniform",
        vocab_n=8,
    )
    rng = np.random.RandomState(5)
    feats = rng.randn(2, 20, 12).astype(np.float32)
    inp_len = np.array([20, 15], np.float32)
    mask = np.asarray(get_padding_bias(jnp.asarray(inp_len.astype(np.int32)),
                                       5, 4))
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len),
        is_training=False, mask=tf.constant(mask),
        attention_penalty_mask=None, in_len_div=4,
    ).numpy()

    opt = tf_keras.optimizers.legacy.Adam(1e-3)
    ckpt = tf.train.Checkpoint(optimizer=opt, model=ref)
    src_dir = str(tmp_path / "tf")
    ckpt.save(os.path.join(src_dir, "ckpt"))

    vocab = tmp_path / "tiny.vocab"
    vocab.write_text("".join(t + "\n" for t in
                             ["<PADDING_SYMBOL>", "a", "b", "c", "d", "$", "@"]))
    out_ckpt = str(tmp_path / "imported")
    argv = [
        "prog",
        "--path-base=%s" % str(tmp_path), "--path-vocab=tiny.vocab",
        "--path-ckpt=%s" % out_ckpt, "--feat-dim=12",
        "--model-type=stf", "--model-encoder-num=2",
        "--model-dimension=16", "--model-att-head-num=4",
        "--model-inner-dim=32",
        "--model-conv-layer-num=2", "--model-conv-filter-num=4",
        "--model-initializer=glorot_uniform",
        "--model-ap-encoder=False",
        "--train-inp-dropout=0.0", "--train-inn-dropout=0.0",
        "--train-res-dropout=0.0", "--train-att-dropout=0.0",
        "--train-opti-type=adam", "--train-lr-param-k=0.001",
        "--tpu-import-src=%s" % src_dir,
    ]
    import_main(argv)

    manager = CheckpointManager(out_ckpt)
    step = manager.latest_step()
    model = ConvEncoder(
        num_layers=2, d_model=16, num_heads=4, dff=32, feat_dim=12,
        vocab_n=8, input_dropout=0.0, inner_dropout=0.0,
        residual_dropout=0.0, attention_dropout=0.0, nfilt=4, cnn_n=2,
        init_name="glorot_uniform", attention_impl="plain",
    )
    variables = model.init(
        {"params": KEY, "dropout": KEY}, jnp.asarray(feats),
        jnp.asarray(inp_len.astype(np.int32)), False,
        jnp.asarray(mask), None, 4,
    )
    import optax

    from srf_tpu.train.state import TrainState
    from srf_tpu.trainer_sr import state_to_tree

    template = TrainState.create(
        variables["params"], optax.adam(1e-3),
        variables.get("batch_stats", {}),
    )
    restored = manager.restore(step, state_to_tree(template))
    manager.close()
    ours = model.apply(
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
        jnp.asarray(feats), jnp.asarray(inp_len.astype(np.int32)), False,
        jnp.asarray(mask), None, 4,
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref_out, atol=5e-5, rtol=1e-4
    )


def _write_vocab(tmp_path):
    vocab = tmp_path / "tiny.vocab"
    vocab.write_text("".join(t + "\n" for t in
                             ["<PADDING_SYMBOL>", "a", "b", "c", "d", "$", "@"]))


def _restore_via_registry(out_ckpt, cfg_kwargs):
    import types

    import jax

    from srf_tpu.models.registry import build_model
    from srf_tpu.train.optimizer import get_optimizer
    from srf_tpu.trainer_sr import state_template, state_to_tree, tree_to_state
    from srf_tpu.utils.checkpoint import CheckpointManager

    base = dict(
        train_opti_type="adam", train_lr_param_k=0.001, tpu_seed=1234,
        train_warmup_n=100, train_adam_beta1=0.9, train_adam_beta2=0.98,
        train_adam_epsilon=1e-9, train_max_lr=1e9, model_dimension=16,
        model_caps_layer_time=None,
    )
    base.update(cfg_kwargs)
    cfg = types.SimpleNamespace(**base)
    tx, _ = get_optimizer(cfg)
    model, _ = build_model(cfg, 8, None)
    template = state_template(model, cfg, tx, jax.random.PRNGKey(1))
    manager = CheckpointManager(out_ckpt)
    restored = tree_to_state(
        manager.restore(manager.latest_step(), state_to_tree(template))
    )
    manager.close()
    return model, restored


def test_import_blstm_cnnfe_forward_parity(tmp_path):
    from tfsr.model.lstm_encoder import LstmEncoder as RefLstm

    from srf_tpu.tools.import_tf_ckpt import main as import_main

    units = 8
    cfg = types.SimpleNamespace(
        model_encoder_num=2, model_dimension=units, train_inp_dropout=0.0,
        train_inn_dropout=0.0, model_initializer="glorot_uniform",
        model_type="blstm", model_conv_stride=2, model_conv_layer_num=2,
        model_conv_filter_num=4, feat_dim=12, model_lstm_is_cnnfe=True,
    )
    ref = RefLstm(cfg, vocab_n=8)
    rng = np.random.RandomState(9)
    feats = rng.randn(2, 20, 12).astype(np.float32)
    inp_len = np.array([20, 15], np.float32)
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len), training=False
    ).numpy()
    ckpt = tf.train.Checkpoint(model=ref)
    src_dir = str(tmp_path / "tf")
    ckpt.save(os.path.join(src_dir, "ckpt"))
    _write_vocab(tmp_path)

    out_ckpt = str(tmp_path / "imported")
    import_main([
        "prog", "--path-base=%s" % str(tmp_path), "--path-vocab=tiny.vocab",
        "--path-ckpt=%s" % out_ckpt, "--feat-dim=12",
        "--model-type=blstm", "--model-encoder-num=2",
        "--model-dimension=%d" % units, "--model-lstm-is-cnnfe=True",
        "--model-conv-layer-num=2", "--model-conv-filter-num=4",
        "--model-initializer=glorot_uniform",
        "--train-inp-dropout=0.0", "--train-inn-dropout=0.0",
        "--train-opti-type=adam", "--train-lr-param-k=0.001",
        "--tpu-import-src=%s" % src_dir,
    ])
    model, restored = _restore_via_registry(out_ckpt, dict(
        model_type="blstm", model_encoder_num=2, model_dimension=units,
        model_lstm_is_cnnfe=True, model_lstm_merge="ave",
        model_conv_stride=2, model_conv_layer_num=2, model_conv_filter_num=4,
        feat_dim=12, model_initializer="glorot_uniform",
        train_inp_dropout=0.0, train_inn_dropout=0.0,
    ))
    ours = model.apply(
        {"params": restored.params, "batch_stats": restored.batch_stats},
        jnp.asarray(feats), jnp.asarray(inp_len.astype(np.int32)), False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-5,
                               rtol=1e-4)


def test_import_uni_lstm_forward_parity(tmp_path):
    """Unidirectional LSTM without front-end (enc_layers/N/cell path)."""
    from tfsr.model.lstm_encoder import LstmEncoder as RefLstm

    from srf_tpu.tools.import_tf_ckpt import main as import_main

    units = 8
    cfg = types.SimpleNamespace(
        model_encoder_num=2, model_dimension=units, train_inp_dropout=0.0,
        train_inn_dropout=0.0, model_initializer="glorot_uniform",
        model_type="lstm", model_conv_stride=2, model_conv_layer_num=2,
        model_conv_filter_num=4, feat_dim=12, model_lstm_is_cnnfe=False,
    )
    ref = RefLstm(cfg, vocab_n=8)
    rng = np.random.RandomState(13)
    feats = rng.randn(2, 14, 12).astype(np.float32)
    inp_len = np.array([14, 10], np.float32)
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len), training=False
    ).numpy()
    ckpt = tf.train.Checkpoint(model=ref)
    src_dir = str(tmp_path / "tf")
    ckpt.save(os.path.join(src_dir, "ckpt"))
    _write_vocab(tmp_path)
    out_ckpt = str(tmp_path / "imported")
    import_main([
        "prog", "--path-base=%s" % str(tmp_path), "--path-vocab=tiny.vocab",
        "--path-ckpt=%s" % out_ckpt, "--feat-dim=12",
        "--model-type=lstm", "--model-encoder-num=2",
        "--model-dimension=%d" % units, "--model-lstm-is-cnnfe=False",
        "--model-initializer=glorot_uniform",
        "--train-inp-dropout=0.0", "--train-inn-dropout=0.0",
        "--train-opti-type=adam", "--train-lr-param-k=0.001",
        "--tpu-import-src=%s" % src_dir,
    ])
    model, restored = _restore_via_registry(out_ckpt, dict(
        model_type="lstm", model_encoder_num=2, model_dimension=units,
        model_lstm_is_cnnfe=False, model_lstm_merge="ave",
        model_conv_stride=2, model_conv_layer_num=2, model_conv_filter_num=4,
        feat_dim=12, model_initializer="glorot_uniform",
        train_inp_dropout=0.0, train_inn_dropout=0.0,
    ))
    ours = model.apply(
        {"params": restored.params, "batch_stats": restored.batch_stats},
        jnp.asarray(feats), jnp.asarray(inp_len.astype(np.int32)), False,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-5,
                               rtol=1e-4)


def test_import_cnn_maxpool_forward_parity(tmp_path):
    """Maxpool CNN variant (no cnn_fe front-end; --model-conv-is-mp)."""
    from tfsr.model.cnn_encoder import CNNEncoder as RefCNN

    from srf_tpu.tools.import_tf_ckpt import main as import_main

    cfg = types.SimpleNamespace(
        model_initializer="glorot_uniform", model_encoder_num=6,
        model_conv_inp_nfilt=8, model_conv_inn_nfilt=12,
        model_conv_proj_num=3, model_conv_proj_dim=24,
        model_conv_stride=1, model_conv_layer_num=2,
        model_conv_filter_num=4, feat_dim=12,
        train_inn_dropout=0.0, train_inp_dropout=0.0,
    )
    ref = RefCNN(cfg, _Log(), class_n=8)
    rng = np.random.RandomState(17)
    feats = rng.randn(2, 24, 12).astype(np.float32)
    inp_len = np.array([24, 18], np.float32)
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len), training=False
    ).numpy()
    ckpt = tf.train.Checkpoint(model=ref)
    src_dir = str(tmp_path / "tf")
    ckpt.save(os.path.join(src_dir, "ckpt"))
    _write_vocab(tmp_path)
    out_ckpt = str(tmp_path / "imported")
    import_main([
        "prog", "--path-base=%s" % str(tmp_path), "--path-vocab=tiny.vocab",
        "--path-ckpt=%s" % out_ckpt, "--feat-dim=12",
        "--model-type=cnn", "--model-conv-is-mp=True",
        "--model-encoder-num=6",
        "--model-conv-inp-nfilt=8", "--model-conv-inn-nfilt=12",
        "--model-conv-proj-num=3", "--model-conv-proj-dim=24",
        "--model-conv-stride=1", "--model-conv-layer-num=2",
        "--model-conv-filter-num=4",
        "--model-initializer=glorot_uniform",
        "--train-inp-dropout=0.0", "--train-inn-dropout=0.0",
        "--train-opti-type=adam", "--train-lr-param-k=0.001",
        "--tpu-import-src=%s" % src_dir,
    ])
    model, restored = _restore_via_registry(out_ckpt, dict(
        model_type="cnn", model_conv_is_mp=True, model_encoder_num=6,
        model_conv_inp_nfilt=8, model_conv_inn_nfilt=12,
        model_conv_proj_num=3, model_conv_proj_dim=24,
        model_conv_stride=1, model_conv_layer_num=2,
        model_conv_filter_num=4, feat_dim=12,
        model_initializer="glorot_uniform",
        train_inp_dropout=0.0, train_inn_dropout=0.0,
    ))
    ours = model.apply(
        {"params": restored.params, "batch_stats": restored.batch_stats},
        jnp.asarray(feats), jnp.asarray(inp_len.astype(np.int32)), False,
    )
    # TF is pinned to 1 intra-op thread (conftest), yet this stride-1
    # 10-layer chain still drifts to ~2.4e-4 abs on ~2% of elements in
    # isolation and past 3e-4 occasionally when the whole suite runs
    # (Eigen/oneDNN pick different conv algorithms under load) — conv
    # accumulation order, not a mapping bug (a wrong transpose is O(1));
    # rtol stays tight so large-magnitude outputs are compared at 1e-4,
    # and the canonical stride variant below keeps atol 5e-5
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-4,
                               rtol=1e-4)


def test_import_cnn_stride_forward_parity(tmp_path):
    from tfsr.model.cnn_stride_encoder import CNNStrideEncoder as RefCNN

    from srf_tpu.tools.import_tf_ckpt import main as import_main

    cfg = types.SimpleNamespace(
        model_initializer="glorot_uniform", model_encoder_num=6,
        model_conv_inp_nfilt=8, model_conv_inn_nfilt=12,
        model_conv_proj_num=3, model_conv_proj_dim=24,
        model_conv_stride=2, model_conv_layer_num=2,
        model_conv_filter_num=4, feat_dim=12,
        train_inn_dropout=0.0, train_inp_dropout=0.0,
    )
    ref = RefCNN(cfg, _Log(), class_n=8)
    rng = np.random.RandomState(11)
    feats = rng.randn(2, 32, 12).astype(np.float32)
    inp_len = np.array([32, 25], np.float32)
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len), training=False
    ).numpy()
    ckpt = tf.train.Checkpoint(model=ref)
    src_dir = str(tmp_path / "tf")
    ckpt.save(os.path.join(src_dir, "ckpt"))
    _write_vocab(tmp_path)

    out_ckpt = str(tmp_path / "imported")
    import_main([
        "prog", "--path-base=%s" % str(tmp_path), "--path-vocab=tiny.vocab",
        "--path-ckpt=%s" % out_ckpt, "--feat-dim=12",
        "--model-type=cnn", "--model-conv-is-mp=False",
        "--model-encoder-num=6",
        "--model-conv-inp-nfilt=8", "--model-conv-inn-nfilt=12",
        "--model-conv-proj-num=3", "--model-conv-proj-dim=24",
        "--model-conv-layer-num=2", "--model-conv-filter-num=4",
        "--model-initializer=glorot_uniform",
        "--train-inp-dropout=0.0", "--train-inn-dropout=0.0",
        "--train-opti-type=adam", "--train-lr-param-k=0.001",
        "--tpu-import-src=%s" % src_dir,
    ])
    model, restored = _restore_via_registry(out_ckpt, dict(
        model_type="cnn", model_conv_is_mp=False, model_encoder_num=6,
        model_conv_inp_nfilt=8, model_conv_inn_nfilt=12,
        model_conv_proj_num=3, model_conv_proj_dim=24,
        model_conv_stride=2, model_conv_layer_num=2,
        model_conv_filter_num=4, feat_dim=12,
        model_initializer="glorot_uniform",
        train_inp_dropout=0.0, train_inn_dropout=0.0,
    ))
    ours = model.apply(
        {"params": restored.params, "batch_stats": restored.batch_stats},
        jnp.asarray(feats), jnp.asarray(inp_len.astype(np.int32)), False,
    )
    # deep conv stack with TF pinned to 1 intra-op thread (conftest):
    # accumulation order is deterministic, tolerance stays tight
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=5e-5,
                               rtol=1e-4)


def test_import_rejects_wrong_architecture(tmp_path):
    from tfsr.model.sequence_router_naive import SequenceRouter as Ref

    from srf_tpu.tools.import_tf_ckpt import main as import_main

    config = _ref_config()
    ref = Ref(config, _Log(), class_n=8)
    ref.call(tf.constant(np.zeros((1, 20, 12), np.float32)),
             input_lengths=tf.constant([20.0]), training=False)
    ckpt = tf.train.Checkpoint(model=ref)
    src_dir = str(tmp_path / "tf")
    ckpt.save(os.path.join(src_dir, "ckpt"))
    vocab = tmp_path / "tiny.vocab"
    vocab.write_text("".join(t + "\n" for t in
                             ["<PADDING_SYMBOL>", "a", "b", "c", "d", "$", "@"]))
    argv = [
        "prog", "--path-base=%s" % str(tmp_path), "--path-vocab=tiny.vocab",
        "--path-ckpt=%s" % str(tmp_path / "out"), "--feat-dim=12",
        "--model-type=srf", "--model-caps-type=naive",
        "--model-caps-context=True",
        "--model-encoder-num=5",  # checkpoint has 3
        "--model-caps-primary-num=6", "--model-caps-primary-dim=4",
        "--model-caps-convolution-num=5", "--model-caps-convolution-dim=4",
        "--model-caps-class-dim=4", "--model-caps-iter=1",
        "--model-caps-window-lpad=1", "--model-caps-window-rpad=1",
        "--model-conv-layer-num=2", "--model-conv-filter-num=4",
        "--tpu-import-src=%s" % src_dir,
    ]
    with pytest.raises(SystemExit, match="capsule layers"):
        import_main(argv)
