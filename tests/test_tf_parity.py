"""Numeric parity vs the ORIGINAL reference implementation.

Builds the reference TF model (imported read-only from /root/reference),
copies its weights into our flax params, and compares forward outputs on the
same inputs in eval mode. This is the strongest drift detector: it catches
padding conventions, BN/LN epsilons, maxout orderings, routing math.

Requires the legacy-Keras shim (the reference is Keras-2 code); skipped if
unavailable. The reference->flax layout maps live in tests/tf_transplant.py
(shared with the gradient-parity suite).
"""

import os
import sys
import types

import numpy as np
import pytest

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
# oneDNN's softmax kernel rejects the reference DR path's 6-D tensors
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
tf = pytest.importorskip("tensorflow")
if not getattr(getattr(tf.keras, "layers", None), "Masking", None):
    pytest.skip("keras unavailable", allow_module_level=True)
try:
    import tf_keras  # noqa: F401
except ImportError:
    pytest.skip("legacy keras shim unavailable", allow_module_level=True)

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from tests import tf_transplant as tp


class _Log:
    def __getattr__(self, name):
        return lambda *a, **k: None


def _ref_config(**overrides):
    base = dict(
        model_initializer="glorot_uniform",
        model_conv_layer_num=2,
        model_conv_filter_num=4,
        feat_dim=12,
        model_encoder_num=3,
        model_caps_iter=1,
        model_caps_window_lpad=1,
        model_caps_window_rpad=1,
        model_caps_context=True,
        model_caps_primary_num=6,
        model_caps_primary_dim=4,
        model_caps_convolution_num=5,
        model_caps_convolution_dim=4,
        model_caps_class_dim=4,
        train_inp_dropout=0.0,
        train_inn_dropout=0.0,
    )
    base.update(overrides)
    return types.SimpleNamespace(**base)


# kept as aliases: test_tf_parity_more historically imports these names
def _copy_convfe_weights(ref_conv, params, cnn_n):
    return tp.convfe_params(ref_conv, params, cnn_n)


def _convfe_batch_stats(ref_conv, cnn_n):
    return tp.convfe_batch_stats(ref_conv, cnn_n)


@pytest.mark.parametrize("is_context", [True, False])
def test_srf_forward_matches_reference(is_context):
    from tfsr.model.sequence_router_naive import SequenceRouter as RefSRF

    from srf_tpu.models.srf import SequenceRouter

    config = _ref_config(model_caps_context=is_context)
    ref = RefSRF(config, _Log(), class_n=8)

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 20, 12).astype(np.float32)
    inp_len = np.array([20, 15], np.float32)
    ref_out = ref.call(
        tf.constant(feats), input_lengths=tf.constant(inp_len), training=False
    ).numpy()

    model = SequenceRouter(
        feat_dim=12, class_n=8, enc_num=3, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4, caps_class_dim=4,
        caps_iter=1, lpad=1, rpad=1, is_context=is_context,
        conv_layer_num=2, conv_filter_num=4, caps_type="naive",
        inp_dropout=0.0, inn_dropout=0.0, init_name="glorot_uniform",
    )
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key}, jnp.asarray(feats),
        jnp.asarray(inp_len, jnp.int32), False,
    )
    params = tp.transplant_srf_naive(ref, variables["params"], enc_num=3)
    batch_stats = {"conv_feat": tp.convfe_batch_stats(ref.conv, 2)}

    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(feats), jnp.asarray(inp_len, jnp.int32), False,
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-3, atol=2e-4)
