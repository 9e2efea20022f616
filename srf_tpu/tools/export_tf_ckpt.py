"""CLI: export an srf_tpu checkpoint as a REFERENCE TensorFlow checkpoint.

The inverse of ``tools/import_tf_ckpt``: models trained here migrate BACK
to the reference (sephiroce/srf), whose trainers restore
``tf.train.Checkpoint(optimizer=..., model=...)`` objects
(reference: tfsr/helper/misc_helper.py:139-163). Two-way migration means
adopting this framework is not a one-way door.

    python -m srf_tpu.tools.export_tf_ckpt --config=egs/conf/timit.conf \
        --path-base=... --path-vocab=... [model flags] \
        --path-ckpt=checkpoint/ours [--path-ckpt-epoch N] \
        --tpu-export-dst=/path/out --tpu-export-ref-repo=/path/to/srf

The reference repo is imported READ-ONLY to instantiate its live model
classes (the same technique as the parity suites, tests/test_tf_parity.py);
our params are written into the layers with ``set_weights`` using the
inverse of the transplant layout (tests/tf_transplant.py — the
correspondence both parity directions share), and the result is saved with
the reference's exact object graph so ``tfsr`` restores it natively.
Optimizer slot variables are not exported (the reference restore of a
fresh-optimizer checkpoint simply re-creates Adam moments, the same policy
as our importer). Supported: all four families — SRF (any flavor: weight
tensors are reshaped to each flavor's broadcast layout), STF, (B)LSTM
(with or without the CNN front-end), and both CNN variants.
"""

import os
import sys

import jax
import numpy as np

from srf_tpu.config import Logger, ParseOption


# ---------------------------------------------------------------- setters
def _set_dense(layer, tree):
    ws = [np.asarray(tree["kernel"])]
    if "bias" in tree:
        ws.append(np.asarray(tree["bias"]))
    layer.set_weights(ws)


def _set_ln(layer, tree):
    layer.set_weights([np.asarray(tree["scale"]), np.asarray(tree["bias"])])


def _set_convfe(ref_conv, fe_params, fe_stats, cnn_n=2):
    """Our ConvFrontEnd params (+ BN moving stats) -> reference
    CapsulationLayer (reference: tfsr/model/sequence_router.py:62-81).
    Keras BN weight order: gamma, beta, moving_mean, moving_var."""
    for layer in range(cnn_n):
        for branch in range(2):
            t = fe_params["conv%d_%d" % (layer, branch)]
            ref_conv.conv_layers[branch][layer].set_weights(
                [np.asarray(t["kernel"]), np.asarray(t["bias"])]
            )
        bn = fe_params["bn%d" % layer]
        st = (fe_stats or {}).get("bn%d" % layer)
        mean = (np.asarray(st["mean"]) if st
                else np.zeros_like(np.asarray(bn["bias"])))
        var = (np.asarray(st["var"]) if st
               else np.ones_like(np.asarray(bn["bias"])))
        ref_conv.bn_layers[layer].set_weights(
            [np.asarray(bn["scale"]), np.asarray(bn["bias"]), mean, var]
        )


# ------------------------------------------------------------- per family
def export_srf(ref, params, batch_stats, enc_num):
    """Inverse of tests/tf_transplant.transplant_srf_naive. The W/b
    routing tensors are reshaped to the target flavor's broadcast layout
    (naive/lowmemory/einsum differ only by 1-dims)."""
    _set_convfe(ref.conv, params["conv_feat"],
                (batch_stats or {}).get("conv_feat"))
    _set_dense(ref.proj_pe, params["flatten"])
    for i in range(2):
        _set_dense(ref.ecs[i], params["encaps%d" % (i + 1)])
    _set_ln(ref.ln_i, params["ln_input"])
    for i in range(enc_num):
        _set_ln(ref.ln_m[i], params["ln_mid%d" % (i + 1)])
    _set_ln(ref.ln_o, params["ln_output"])
    for i in range(enc_num):
        for var, ours in ((ref.wgt[i], params["W%d" % i]),
                          (ref.bias[i], params["b%d" % i])):
            arr = np.asarray(ours)
            if int(np.prod(var.shape)) != arr.size:
                raise SystemExit(
                    "routing tensor size mismatch at layer %d: reference "
                    "%s vs ours %s — check --model-caps-* flags"
                    % (i, tuple(var.shape), arr.shape)
                )
            var.assign(arr.reshape(var.shape))


def export_stf(ref, params, batch_stats, num_layers):
    """Inverse of tests/tf_transplant.transplant_stf."""
    _set_convfe(ref.conv, params["conv"], (batch_stats or {}).get("conv"))
    _set_dense(ref.linear_projection, params["linear_projection"])
    _set_ln(ref.layernorm, params["ln"])
    _set_dense(ref.proj, params["proj"])
    for i in range(num_layers):
        blk, p = ref.enc_layers[i], params["enc%d" % i]
        _set_ln(blk.layernorm_cur, p["ln_cur"])
        _set_ln(blk.layernorm_res, p["ln_res"])
        _set_dense(blk.mha.dense_layer_for_query, p["mha"]["wq"])
        _set_dense(blk.mha.dense_layer_for_key, p["mha"]["wk"])
        _set_dense(blk.mha.dense_layer_for_value, p["mha"]["wv"])
        _set_dense(blk.mha.dense, p["mha"]["wo"])
        _set_dense(blk.ffn.ff_relu, p["ffn"]["ff1"])
        _set_dense(blk.ffn.ff_proj, p["ffn"]["ff2"])


def _set_keras_lstm(layer, tree):
    """Inverse of tests/tf_transplant.keras_lstm: flax per-gate kernels ->
    Keras fused [kernel | recurrent | bias] with gate order [i|f|c|o]."""
    kernel = np.concatenate(
        [np.asarray(tree["i" + g]["kernel"]) for g in "ifgo"], axis=1
    )
    recurrent = np.concatenate(
        [np.asarray(tree["h" + g]["kernel"]) for g in "ifgo"], axis=1
    )
    bias = np.concatenate(
        [np.asarray(tree["h" + g]["bias"]) for g in "ifgo"], axis=0
    )
    layer.set_weights([kernel, recurrent, bias])


def export_lstm(ref, params, batch_stats, num_layers, bidirectional):
    """Inverse of tests/tf_transplant.transplant_lstm (+ optional CNN
    front-end, reference: tfsr/model/lstm_encoder.py:31-103)."""
    if "conv_feat" in params and hasattr(ref, "conv"):
        _set_convfe(ref.conv, params["conv_feat"],
                    (batch_stats or {}).get("conv_feat"))
    for i in range(num_layers):
        rl = ref.enc_layers[i]
        if bidirectional:
            _set_keras_lstm(rl.forward_layer, params["lstm%d_f" % i])
            _set_keras_lstm(rl.backward_layer, params["lstm%d_b" % i])
        else:
            _set_keras_lstm(rl, params["lstm%d_f" % i])
        _set_ln(ref.layernorms[i], params["ln%d" % i])
    _set_dense(ref.proj, params["proj"])
    _set_ln(ref.ln, params["ln_out"])


def export_cnn(ref, params, batch_stats, enc_num, proj_layers):
    """Inverse of tests/tf_transplant.transplant_cnn_stride (stride
    variant has the cnn_fe front-end; maxpool shares the body attrs,
    reference: tfsr/model/cnn_stride_encoder.py:36-146,
    cnn_encoder.py:34-182)."""
    if "conv_feat" in params and hasattr(ref, "cnn_fe"):
        _set_convfe(ref.cnn_fe, params["conv_feat"],
                    (batch_stats or {}).get("conv_feat"))
    body = params["body"]
    for i in range(enc_num):
        _set_dense(ref.enc_layers[i], body["conv%d" % i])
        _set_ln(ref.layernorms[i], body["ln%d" % i])
    for i in range(proj_layers - 1):
        _set_dense(ref.proj[i].layer, body["proj%d" % i])
        _set_ln(ref.layernorms_proj[i], body["proj_ln%d" % i])
    _set_dense(ref.projv.layer, body["projv"])
    _set_ln(ref.layernorms_projv, body["projv_ln"])


# ---------------------------------------------------------------- builder
class _Log:
    """Logger shim for reference constructors (they only .info/.debug)."""

    def __getattr__(self, name):
        return lambda *a, **k: None


def build_reference_model(config, class_n, feats, inp_len):
    """Instantiate the reference model for ``--model-type`` and run one
    eval forward so every variable exists. Returns the live TF model."""
    import tensorflow as tf

    model_type = (config.model_type or "srf").lower()
    if model_type == "stf":
        from tfsr.trainer_tf import ConvEncoder as RefSTF

        from srf_tpu.models.registry import stf_in_len_div
        from srf_tpu.ops.masking import get_padding_bias

        ref = RefSTF(
            num_layers=config.model_encoder_num,
            d_model=config.model_dimension,
            num_heads=config.model_att_head_num,
            dff=config.model_inner_dim,
            feat_dim=config.feat_dim,
            input_dropout=0.0, inner_dropout=0.0, residual_dropout=0.0,
            attention_dropout=0.0,
            nfilt=config.model_conv_filter_num,
            cnn_n=config.model_conv_layer_num,
            init=config.model_initializer,
            vocab_n=class_n,
        )
        import jax.numpy as jnp

        div = stf_in_len_div(config)
        mask = np.asarray(get_padding_bias(
            jnp.asarray(inp_len, jnp.int32),
            -(-feats.shape[1] // div), div,
        ))
        ref.call(
            tf.constant(feats), input_lengths=tf.constant(inp_len),
            is_training=False, mask=tf.constant(mask),
            attention_penalty_mask=None, in_len_div=div,
        )
        return ref
    if model_type.endswith("lstm"):
        from tfsr.model.lstm_encoder import LstmEncoder as RefLstm

        ref = RefLstm(config, vocab_n=class_n)
    elif model_type in ("cnn", "conv", "convolution"):
        if config.model_conv_is_mp:
            from tfsr.model.cnn_encoder import CNNEncoder as RefCNN
        else:
            from tfsr.model.cnn_stride_encoder import (
                CNNStrideEncoder as RefCNN,
            )
        ref = RefCNN(config, _Log(), class_n=class_n)
    else:
        flavor = (config.model_caps_type or "naive").lower()
        if flavor.startswith("lowmem"):
            from tfsr.model.sequence_router_lowmemory import (
                SequenceRouter as RefSRF,
            )
        elif flavor == "einsum":
            from tfsr.model.sequence_router_einsum import (
                SequenceRouter as RefSRF,
            )
        else:
            from tfsr.model.sequence_router_naive import (
                SequenceRouter as RefSRF,
            )
        ref = RefSRF(config, _Log(), class_n=class_n)
    # graph mode: the einsum flavor's TensorArray only builds inside a
    # tf.function in this TF (same note as tests/test_import_tf_ckpt.py)
    tf.function(
        lambda f, l: ref.call(f, input_lengths=l, training=False)
    )(tf.constant(feats), tf.constant(inp_len))
    return ref


def main(argv=None):
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
    logger = Logger(name="export_tf_ckpt", level=Logger.DEBUG).logger
    config = ParseOption(argv or sys.argv, logger).args
    if not config.tpu_export_dst:
        raise SystemExit("--tpu-export-dst is required")
    ref_repo = config.tpu_export_ref_repo or os.environ.get("SRF_REF_REPO")
    if not ref_repo or not os.path.isdir(ref_repo):
        raise SystemExit(
            "--tpu-export-ref-repo (or $SRF_REF_REPO) must point to a "
            "checkout of the reference (sephiroce/srf)"
        )
    sys.path.insert(0, ref_repo)

    import tensorflow as tf

    from srf_tpu.models.registry import build_model
    from srf_tpu.train.optimizer import get_optimizer
    from srf_tpu.trainer_sr import state_template, state_to_tree
    from srf_tpu.utils.checkpoint import load_checkpoint
    from srf_tpu.utils.vocab import get_file_path, load_vocab

    _, _, dec_in_dim, _ = load_vocab(
        get_file_path(config.path_base, config.path_vocab), logger
    )
    class_n = dec_in_dim + 1
    tx, _ = get_optimizer(config)
    rng = jax.random.PRNGKey(config.tpu_seed)
    model, _ = build_model(config, class_n, logger)
    template = state_template(model, config, tx, rng)
    manager, restored, epoch = load_checkpoint(
        config, logger, state_to_tree(template), params_only=True
    )
    manager.close()
    if restored is None:
        raise SystemExit("no checkpoint under %s" % config.path_ckpt)
    params = jax.device_get(restored["params"])
    batch_stats = jax.device_get(restored.get("batch_stats") or {})

    # dummy batch to build the reference variables (eval mode)
    feats = np.zeros((1, 20, config.feat_dim), np.float32)
    inp_len = np.array([20.0], np.float32)
    ref = build_reference_model(config, class_n, feats, inp_len)

    model_type = (config.model_type or "srf").lower()
    if model_type == "stf":
        export_stf(ref, params, batch_stats, config.model_encoder_num)
    elif model_type.endswith("lstm"):
        export_lstm(ref, params, batch_stats, config.model_encoder_num,
                    bidirectional=(model_type == "blstm"))
    elif model_type in ("cnn", "conv", "convolution"):
        export_cnn(ref, params, batch_stats, config.model_encoder_num,
                   proj_layers=config.model_conv_proj_num)
    else:
        export_srf(ref, params, batch_stats, config.model_encoder_num)

    # the reference's exact object graph (tfsr/helper/misc_helper.py:141)
    optimizer = tf.keras.optimizers.Adam()
    ckpt = tf.train.Checkpoint(optimizer=optimizer, model=ref)
    os.makedirs(config.tpu_export_dst, exist_ok=True)
    tf_manager = tf.train.CheckpointManager(
        ckpt, config.tpu_export_dst, max_to_keep=None,
        checkpoint_name="ckpt",
    )
    out = tf_manager.save(checkpoint_number=max(int(epoch), 1))
    logger.info(
        "Exported %d variables -> %s (reference restores it with "
        "tf.train.Checkpoint(optimizer=..., model=...); optimizer slots "
        "are fresh)", len(ref.variables), out,
    )
    return out


if __name__ == "__main__":
    main()
