"""Shared weight/gradient transplant maps: reference TF models -> flax trees.

Each ``transplant_*`` function maps a reference model's per-layer arrays
into our flax param-tree naming. The ``get`` argument abstracts WHAT is
extracted per layer:

- ``weights_of`` (default): ``layer.get_weights()`` — used by the forward
  weight-transplant parity tests;
- ``grads_of(tape_grads)``: the tf.GradientTape gradients of the same
  variables, in the same order — used by the one-train-step gradient
  parity tests (VERDICT r1 item 4). Non-trainable variables (BN moving
  stats) yield None and are skipped by the builders.

This keeps a single source of truth for the reference->flax layout so the
forward and gradient parity suites can't drift apart.
"""

import jax.numpy as jnp
import numpy as np


def weights_of(layer):
    return layer.get_weights()


def grads_of(grad_by_ref):
    """Extractor returning each variable's tape gradient (None if absent)."""

    def get(layer):
        out = []
        for v in layer.weights:
            g = grad_by_ref.get(v.ref())
            out.append(None if g is None else np.asarray(g))
        return out

    return get


def tape_grad_map(tape, loss, model):
    grads = tape.gradient(loss, model.trainable_variables)
    return {
        v.ref(): g for v, g in zip(model.trainable_variables, grads)
    }


def dense(layer, get=weights_of):
    arrays = get(layer)
    if len(arrays) == 2:
        return {"kernel": jnp.asarray(arrays[0]), "bias": jnp.asarray(arrays[1])}
    return {"kernel": jnp.asarray(arrays[0])}


def ln(layer, get=weights_of):
    gamma, beta = get(layer)[:2]
    return {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}


def convfe_params(ref_conv, template, cnn_n, get=weights_of):
    """Reference CapsulationLayer -> our ConvFrontEnd params.

    Reference call uses conv_layers[branch][layer]
    (reference: sequence_router.py:76-77). BN moving stats (non-trainable)
    are ignored here; see ``convfe_batch_stats``.
    """
    out = dict(template)
    for layer in range(cnn_n):
        for branch in range(2):
            kr, br = get(ref_conv.conv_layers[branch][layer])[:2]
            out["conv%d_%d" % (layer, branch)] = {
                "kernel": jnp.asarray(kr), "bias": jnp.asarray(br)
            }
        gamma, beta = get(ref_conv.bn_layers[layer])[:2]
        out["bn%d" % layer] = {"scale": jnp.asarray(gamma),
                               "bias": jnp.asarray(beta)}
    return out


def convfe_batch_stats(ref_conv, cnn_n):
    stats = {}
    for layer in range(cnn_n):
        _, _, mean, var = ref_conv.bn_layers[layer].get_weights()
        stats["bn%d" % layer] = {"mean": jnp.asarray(mean),
                                 "var": jnp.asarray(var)}
    return stats


def transplant_srf_naive(ref, params, enc_num, get=weights_of):
    """Reference sequence_router_naive.SequenceRouter -> our SequenceRouter
    params (naive flavor; weight tensors tiled (1,1,...) in the reference)."""
    params = dict(params)
    params["conv_feat"] = convfe_params(ref.conv, params["conv_feat"], 2, get)
    params["flatten"] = dense(ref.proj_pe, get)
    for i in range(2):
        params["encaps%d" % (i + 1)] = dense(ref.ecs[i], get)
    params["ln_input"] = ln(ref.ln_i, get)
    for i in range(enc_num):
        params["ln_mid%d" % (i + 1)] = ln(ref.ln_m[i], get)
    params["ln_output"] = ln(ref.ln_o, get)
    for i in range(enc_num):
        wgt = get_var(ref.wgt[i], get)
        bias = get_var(ref.bias[i], get)
        params["W%d" % i] = jnp.asarray(wgt[0, 0])
        params["b%d" % i] = jnp.asarray(bias[0, 0, :, :, :, 0])
    return params


def get_var(variable, get=weights_of):
    """Extract a bare tf.Variable (not a layer) through the same plumbing."""
    if get is weights_of:
        return variable.numpy()

    class _Shim:
        weights = [variable]

    return get(_Shim())[0]


def transplant_stf(ref, params, num_layers, get=weights_of):
    """Reference trainer_tf.ConvEncoder -> our models/stf.ConvEncoder."""
    params = dict(params)
    params["conv"] = convfe_params(ref.conv, params["conv"], 2, get)
    params["linear_projection"] = dense(ref.linear_projection, get)
    params["ln"] = ln(ref.layernorm, get)
    params["proj"] = dense(ref.proj, get)
    for i, blk in enumerate(ref.enc_layers):
        params["enc%d" % i] = {
            "ln_cur": ln(blk.layernorm_cur, get),
            "ln_res": ln(blk.layernorm_res, get),
            "mha": {
                "wq": dense(blk.mha.dense_layer_for_query, get),
                "wk": dense(blk.mha.dense_layer_for_key, get),
                "wv": dense(blk.mha.dense_layer_for_value, get),
                "wo": dense(blk.mha.dense, get),
            },
            "ffn": {
                "ff1": dense(blk.ffn.ff_relu, get),
                "ff2": dense(blk.ffn.ff_proj, get),
            },
        }
    return params


def keras_lstm(keras_lstm_layer, units, get=weights_of):
    """Keras fused LSTM -> flax OptimizedLSTMCell param dict.

    Keras gate order is [i | f | c | o]; flax names them i/f/g/o with split
    input (i*) and hidden (h*) kernels, bias on the hidden ones."""
    kernel, recurrent, bias = get(keras_lstm_layer)[:3]
    out = {}
    for idx, gate in enumerate(["i", "f", "g", "o"]):
        sl = slice(idx * units, (idx + 1) * units)
        out["i" + gate] = {"kernel": jnp.asarray(kernel[:, sl])}
        out["h" + gate] = {
            "kernel": jnp.asarray(recurrent[:, sl]),
            "bias": jnp.asarray(bias[sl]),
        }
    return out


def transplant_lstm(ref, params, num_layers, units, bidirectional,
                    get=weights_of):
    params = dict(params)
    for idx in range(num_layers):
        ref_layer = ref.enc_layers[idx]
        if bidirectional:
            params["lstm%d_f" % idx] = keras_lstm(
                ref_layer.forward_layer, units, get
            )
            params["lstm%d_b" % idx] = keras_lstm(
                ref_layer.backward_layer, units, get
            )
        else:
            params["lstm%d_f" % idx] = keras_lstm(ref_layer, units, get)
        params["ln%d" % idx] = ln(ref.layernorms[idx], get)
    params["proj"] = dense(ref.proj, get)
    params["ln_out"] = ln(ref.ln, get)
    return params


def transplant_cnn_stride(ref, params, enc_num, proj_layers, get=weights_of):
    params = dict(params)
    params["conv_feat"] = convfe_params(
        ref.cnn_fe, params["conv_feat"], 2, get
    )
    body = dict(params["body"])
    for idx in range(enc_num):
        body["conv%d" % idx] = dense(ref.enc_layers[idx], get)
        body["ln%d" % idx] = ln(ref.layernorms[idx], get)
    for idx in range(proj_layers - 1):
        body["proj%d" % idx] = dense(ref.proj[idx].layer, get)
        body["proj_ln%d" % idx] = ln(ref.layernorms_proj[idx], get)
    body["projv"] = dense(ref.projv.layer, get)
    body["projv_ln"] = ln(ref.layernorms_projv, get)
    params["body"] = body
    return params
