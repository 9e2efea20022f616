"""Model dispatch matching the reference trainer's selection logic.

Reference: tfsr/trainer_sr.py:175-201 — ``--model-type`` ending in "lstm"
selects the LSTM encoder; "cnn"/"conv"/"convolution" selects the maxout CNN
(maxpool or stride variant on ``--model-conv-is-mp``); anything else is SRF
with the ``--model-caps-type`` flavor. ``in_len_div`` (the time-subsampling
divisor used for CTC lengths) follows trainer_sr.py:176-187. The STF model
lives in trainer_tf (reference: trainer_tf.py:286-293) and is exposed here
as model_type "stf" for convenience.
"""

from srf_tpu.models.cnn import CNNEncoder, CNNStrideEncoder
from srf_tpu.models.lstm import LstmEncoder
from srf_tpu.models.srf import SequenceRouter
from srf_tpu.models.stf import ConvEncoder


def stf_in_len_div(config, logger=None):
    """Time-subsampling divisor for the STF path, used by BOTH dispatch
    paths (build_model and trainer_tf) so CTC lengths and mask shapes
    always agree.

    The reference computes ``conv_layer_num ** conv_stride``
    (tfsr/trainer_tf.py:302) — transposed from trainer_sr's
    ``conv_stride ** conv_layer_num`` (tfsr/trainer_sr.py:177-187). Both
    equal 4 at the defaults (2, 2); for any other geometry the reference
    formula disagrees with the front-end's actual subsampling and would
    corrupt CTC lengths. We always use the true formula and warn loudly
    when the two differ, so the deviation is visible (VERDICT r1 item 6).
    """
    true_div = config.model_conv_stride**config.model_conv_layer_num
    ref_div = config.model_conv_layer_num**config.model_conv_stride
    if ref_div != true_div and logger is not None:
        logger.warning(
            "STF in_len_div: using the front-end's true subsampling %d; "
            "the reference formula (layer_num ** stride, "
            "tfsr/trainer_tf.py:302) would give %d for conv geometry "
            "(%d layers, stride %d) and mis-size the CTC lengths",
            true_div, ref_div,
            config.model_conv_layer_num, config.model_conv_stride,
        )
    return true_div


def validate_stf_attention_kernel(config):
    """CLI-side validation of --tpu-attention-kernel, shared by
    build_model and trainer_tf (which constructs ConvEncoder directly —
    without this, a typo'd kernel name silently ran the plain path,
    exactly the OOM the flag exists to avoid). Returns the kernel."""
    att_kernel = getattr(config, "tpu_attention_kernel", "auto")
    if att_kernel == "ring":
        raise ValueError(
            "--tpu-attention-kernel=ring is programmatic-only: ring "
            "(sequence-parallel) attention needs a device mesh, which "
            "the CLI trainers do not construct for the time axis. "
            "Build ConvEncoder(attention_impl='ring', mesh=...) "
            "directly (see srf_tpu/ops/ring_attention.py)."
        )
    if att_kernel not in ("auto", "plain", "blockwise"):
        raise ValueError("unknown --tpu-attention-kernel %r" % att_kernel)
    return att_kernel


def validate_dropout_kernel(config, model_type):
    """CLI-side validation of --tpu-dropout-kernel (same no-silent-drop
    rule as the other kernel flags): the fused hardware-PRNG dropout is
    wired to the CNN family — the regularization-traffic-bound one
    (BENCH_NOTES "Dense-family MFU") — so asking for it elsewhere must
    be loud, not a no-op."""
    impl = getattr(config, "tpu_dropout_kernel", "xla") or "xla"
    if impl not in ("xla", "pallas"):
        raise ValueError("unknown --tpu-dropout-kernel %r" % impl)
    if impl == "pallas" and model_type not in ("cnn", "conv", "convolution"):
        raise ValueError(
            "--tpu-dropout-kernel=pallas is wired to the CNN family only "
            "(model-type %r would silently ignore it)" % model_type
        )
    return impl


def build_model(config, dec_out_dim, logger=None, **overrides):
    """Returns (model, in_len_div)."""
    model_type = (config.model_type or "srf").lower()
    validate_dropout_kernel(config, model_type)
    if model_type.endswith("lstm"):
        model = LstmEncoder.from_config(config, dec_out_dim, **overrides)
        # the model's own property is the single source of the CTC
        # length divisor (an independent re-derivation here could drift
        # from the front-end's actual subsampling)
        in_len_div = model.in_len_div
    elif model_type in ("cnn", "conv", "convolution"):
        in_len_div = config.model_conv_stride**config.model_conv_layer_num
        if config.model_conv_is_mp:
            model = CNNEncoder.from_config(config, dec_out_dim, **overrides)
        else:
            model = CNNStrideEncoder.from_config(config, dec_out_dim, **overrides)
    elif model_type == "stf":
        in_len_div = stf_in_len_div(config, logger)
        validate_stf_attention_kernel(config)
        model = ConvEncoder.from_config(config, dec_out_dim, **overrides)
    else:
        in_len_div = config.model_conv_stride**config.model_conv_layer_num
        if config.model_caps_layer_time is not None:
            if logger is not None:
                logger.critical("LSRF is deprecated")
            raise ValueError("LSRF (model-caps-layer-time) is deprecated")
        if config.model_caps_type not in ("lowmemory", "einsum", "naive"):
            raise ValueError("unknown caps type %s" % config.model_caps_type)
        kernel = getattr(config, "tpu_routing_kernel", "auto")
        if kernel not in ("auto", "xla", "xla_flat", "xla_pre", "xla_factored",
                          "wavefront", "pallas"):
            raise ValueError("unknown --tpu-routing-kernel %r" % kernel)
        if kernel != "auto":
            # includes "xla": the model's routing_impl DEFAULT is "auto"
            # (factored), so the materialized-u_hat baseline must be
            # forwarded explicitly or the flag silently runs factored
            overrides.setdefault("routing_impl", kernel)
        if getattr(config, "tpu_routing_bf16", False):
            overrides.setdefault("routing_bf16", True)
        model = SequenceRouter.from_config(config, dec_out_dim, **overrides)
        if logger is not None:
            logger.info(
                "Layer x %d, Iter x %s, Win %d (l:%d, r:%d), %s",
                config.model_encoder_num,
                "1 (fixed)" if config.model_caps_type == "lowmemory"
                else str(config.model_caps_iter),
                config.model_caps_window_lpad + config.model_caps_window_rpad + 1,
                config.model_caps_window_lpad,
                config.model_caps_window_rpad,
                "SDR" if config.model_caps_context else "DR",
            )
    return model, in_len_div
