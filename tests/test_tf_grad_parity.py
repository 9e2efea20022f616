"""ONE-TRAIN-STEP gradient parity vs the reference (VERDICT r1 item 4).

Forward parity (test_tf_parity*.py) cannot catch loss-, masking- or
scaling-drift. Here we transplant weights, run the reference's exact train
step math — ``tf.nn.ctc_loss(labels, model(feats, training=True), tar_len,
ceil(inp_len/div), blank_index=last) -> compute_average_loss``
(reference: tfsr/trainer_sr.py:41-75, trainer_tf.py:120-160) — under
``tf.GradientTape`` AND under ``jax.grad`` on the same batch, then compare
EVERY parameter gradient through the shared transplant maps
(tests/tf_transplant.py). The models run in eval mode inside the tape:
the reference hardcodes rate-0.2 UNSEEDED dropouts in the front-end and
encaps (reference: sequence_router.py:62-63), so training-mode draws can
never line up across frameworks — eval mode exercises the identical
loss/backward math deterministically (BatchNorm running statistics).

Covers SRF-SDR, SRF-DR, STF, LSTM (uni + bi), CNN — all five model
families' full loss/backward paths.
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

from srf_tpu.ops.ctc import ctc_loss_from_frames
from tests import tf_transplant as tp
from tests.test_tf_parity import _Log, _ref_config

KEY = jax.random.PRNGKey(0)


def _batch(rng, batch=2, frames=20, feat_dim=12, vocab_hi=7, max_tar=4):
    feats = rng.randn(batch, frames, feat_dim).astype(np.float32)
    inp_len = np.array([frames, frames - 5], np.int32)[:batch]
    labels = rng.randint(1, vocab_hi, size=(batch, max_tar)).astype(np.int32)
    tar_len = np.array([max_tar, max_tar - 1], np.int32)[:batch]
    return feats, inp_len, labels, tar_len


def _tf_ctc_grads(ref_model, call, feats, inp_len, labels, tar_len,
                  blank_idx, in_len_div=4):
    with tf.GradientTape() as tape:
        y_pred = call()
        pe_loss = tf.nn.ctc_loss(
            tf.constant(labels), y_pred, tf.constant(tar_len),
            tf.math.ceil(tf.constant(inp_len, tf.float32) / in_len_div),
            logits_time_major=False, blank_index=blank_idx,
        )
        loss = tf.nn.compute_average_loss(
            pe_loss, global_batch_size=int(feats.shape[0])
        )
    return tp.tape_grad_map(tape, loss, ref_model), float(loss)


def _jax_ctc_grads(model, variables, feats, inp_len, labels, tar_len,
                   apply_kwargs=None, in_len_div=4):
    apply_kwargs = apply_kwargs or {}

    def loss_fn(params):
        out = model.apply(
            {"params": params,
             **({"batch_stats": variables["batch_stats"]}
                if "batch_stats" in variables else {})},
            jnp.asarray(feats), jnp.asarray(inp_len), False,
            rngs={"dropout": KEY},
            **apply_kwargs,
        )
        logits = out[0] if isinstance(out, tuple) else out
        pe = ctc_loss_from_frames(
            logits, jnp.asarray(inp_len), in_len_div,
            jnp.asarray(labels), jnp.asarray(tar_len),
        )
        return jnp.sum(pe) / feats.shape[0]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    return grads, float(loss)


def _assert_tree_close(ours, ref, skip_prefixes=()):
    flat_ours = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_ref = {jax.tree_util.keystr(p): v
                for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    compared = 0
    for path, got in flat_ours:
        name = jax.tree_util.keystr(path)
        if any(name.startswith(s) for s in skip_prefixes):
            continue
        want = flat_ref[name]
        assert want is not None, "reference grad missing for %s" % name
        scale = max(1e-6, float(np.max(np.abs(np.asarray(want)))))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want),
            atol=1e-5 + 2e-3 * scale, rtol=0, err_msg=name,
        )
        compared += 1
    assert compared >= len(flat_ours) - len(skip_prefixes) - 1


@pytest.mark.parametrize("is_context", [True, False])
def test_srf_grad_parity(is_context):
    from tfsr.model.sequence_router_naive import SequenceRouter as RefSRF

    from srf_tpu.models.srf import SequenceRouter

    config = _ref_config(model_caps_context=is_context)
    ref = RefSRF(config, _Log(), class_n=8)
    rng = np.random.RandomState(0)
    feats, inp_len, labels, tar_len = _batch(rng)
    # build reference weights
    ref.call(tf.constant(feats), input_lengths=tf.constant(inp_len, tf.float32),
             training=False)
    grad_map, ref_loss = _tf_ctc_grads(
        ref,
        lambda: ref.call(tf.constant(feats),
                         input_lengths=tf.constant(inp_len, tf.float32),
                         training=False),
        feats, inp_len, labels, tar_len, blank_idx=7,
    )

    model = SequenceRouter(
        feat_dim=12, class_n=8, enc_num=3, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4, caps_class_dim=4,
        caps_iter=1, lpad=1, rpad=1, is_context=is_context,
        conv_layer_num=2, conv_filter_num=4, caps_type="naive",
        inp_dropout=0.0, inn_dropout=0.0, init_name="glorot_uniform",
    )
    variables = model.init(
        {"params": KEY, "dropout": KEY}, jnp.asarray(feats),
        jnp.asarray(inp_len), False,
    )
    params = tp.transplant_srf_naive(ref, variables["params"], enc_num=3)
    variables = {
        "params": params,
        "batch_stats": {"conv_feat": tp.convfe_batch_stats(ref.conv, 2)},
    }
    grads, loss = _jax_ctc_grads(model, variables, feats, inp_len, labels,
                                 tar_len)
    assert abs(loss - ref_loss) <= 2e-3 * abs(ref_loss) + 1e-4
    ref_grads = tp.transplant_srf_naive(
        ref, grads, enc_num=3, get=tp.grads_of(grad_map)
    )
    _assert_tree_close(grads, ref_grads)


def test_stf_grad_parity():
    from tfsr.trainer_tf import ConvEncoder as RefEncoder

    from srf_tpu.models.stf import ConvEncoder
    from srf_tpu.ops.masking import get_padding_bias

    ref = RefEncoder(
        num_layers=2, d_model=16, num_heads=4, dff=32, feat_dim=12,
        input_dropout=0.0, inner_dropout=0.0, residual_dropout=0.0,
        attention_dropout=0.0, nfilt=4, cnn_n=2, init="glorot_uniform",
        vocab_n=9,
    )
    rng = np.random.RandomState(1)
    feats, inp_len, labels, tar_len = _batch(rng, vocab_hi=8)
    tf_mask = np.asarray(get_padding_bias(jnp.asarray(inp_len), 5, 4))
    ref.call(tf.constant(feats), input_lengths=tf.constant(inp_len, tf.float32),
             is_training=False, mask=tf.constant(tf_mask),
             attention_penalty_mask=None, in_len_div=4)
    grad_map, ref_loss = _tf_ctc_grads(
        ref,
        lambda: ref.call(
            tf.constant(feats),
            input_lengths=tf.constant(inp_len, tf.float32),
            is_training=False,
            mask=tf.constant(tf_mask), attention_penalty_mask=None,
            in_len_div=4,
        ),
        feats, inp_len, labels, tar_len, blank_idx=8,
    )

    model = ConvEncoder(
        num_layers=2, d_model=16, num_heads=4, dff=32, feat_dim=12,
        vocab_n=9, input_dropout=0.0, inner_dropout=0.0,
        residual_dropout=0.0, attention_dropout=0.0, nfilt=4, cnn_n=2,
        init_name="glorot_uniform",
    )
    mask = jnp.asarray(tf_mask)
    variables = model.init(
        {"params": KEY, "dropout": KEY}, jnp.asarray(feats),
        jnp.asarray(inp_len), False, mask, None, 4,
    )
    params = tp.transplant_stf(ref, variables["params"], num_layers=2)
    variables = {
        "params": params,
        "batch_stats": {"conv": tp.convfe_batch_stats(ref.conv, 2)},
    }
    grads, loss = _jax_ctc_grads(
        model, variables, feats, inp_len, labels, tar_len,
        apply_kwargs=dict(mask=mask, attention_penalty_mask=None,
                          in_len_div=4),
    )
    assert abs(loss - ref_loss) <= 2e-3 * abs(ref_loss) + 1e-4
    ref_grads = tp.transplant_stf(
        ref, grads, num_layers=2, get=tp.grads_of(grad_map)
    )
    _assert_tree_close(grads, ref_grads)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_grad_parity(bidirectional):
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
    rng = np.random.RandomState(2)
    feats, inp_len, labels, tar_len = _batch(rng, frames=14, vocab_hi=8)
    ref.call(tf.constant(feats), input_lengths=tf.constant(inp_len, tf.float32),
             training=False)
    # no front-end: logits per raw frame, in_len_div=1
    grad_map, ref_loss = _tf_ctc_grads(
        ref,
        lambda: ref.call(tf.constant(feats),
                         input_lengths=tf.constant(inp_len, tf.float32),
                         training=False),
        feats, inp_len, labels, tar_len, blank_idx=8, in_len_div=1,
    )

    model = LstmEncoder(
        num_layers=2, d_model=units, vocab_n=9, feat_dim=12,
        bidirectional=bidirectional, input_dropout=0.0, inner_dropout=0.0,
        init_name="glorot_uniform", is_cnnfe=False,
    )
    variables = model.init(
        {"params": KEY, "dropout": KEY}, jnp.asarray(feats),
        jnp.asarray(inp_len), False,
    )
    params = tp.transplant_lstm(
        ref, variables["params"], num_layers=2, units=units,
        bidirectional=bidirectional,
    )
    grads, loss = _jax_ctc_grads(
        model, {"params": params}, feats, inp_len, labels, tar_len,
        in_len_div=1,
    )
    assert abs(loss - ref_loss) <= 2e-3 * abs(ref_loss) + 1e-4
    ref_grads = tp.transplant_lstm(
        ref, grads, num_layers=2, units=units, bidirectional=bidirectional,
        get=tp.grads_of(grad_map),
    )
    _assert_tree_close(grads, ref_grads)


def test_cnn_grad_parity():
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
    rng = np.random.RandomState(3)
    feats, inp_len, labels, tar_len = _batch(rng, frames=32, vocab_hi=8, max_tar=3)
    ref.call(tf.constant(feats), input_lengths=tf.constant(inp_len, tf.float32),
             training=False)
    grad_map, ref_loss = _tf_ctc_grads(
        ref,
        lambda: ref.call(tf.constant(feats),
                         input_lengths=tf.constant(inp_len, tf.float32),
                         training=False),
        feats, inp_len, labels, tar_len, blank_idx=8,
    )

    model = CNNStrideEncoder(
        enc_num=6, class_n=9, feat_dim=12, nfilt_inp=8, nfilt_inn=12,
        proj_layers=3, proj_dim=24, conv_layer_num=2, conv_filter_num=4,
        input_dropout=0.0, inner_dropout=0.0, init_name="glorot_uniform",
    )
    variables = model.init(
        {"params": KEY, "dropout": KEY}, jnp.asarray(feats),
        jnp.asarray(inp_len), False,
    )
    params = tp.transplant_cnn_stride(
        ref, variables["params"], enc_num=6, proj_layers=3
    )
    variables = {
        "params": params,
        "batch_stats": {"conv_feat": tp.convfe_batch_stats(ref.cnn_fe, 2)},
    }
    grads, loss = _jax_ctc_grads(model, variables, feats, inp_len, labels,
                                 tar_len)
    assert abs(loss - ref_loss) <= 2e-3 * abs(ref_loss) + 1e-4
    ref_grads = tp.transplant_cnn_stride(
        ref, grads, enc_num=6, proj_layers=3, get=tp.grads_of(grad_map)
    )
    _assert_tree_close(grads, ref_grads)


def test_srf_training_curve_parity():
    """FIVE full Adam steps in both frameworks on the same batch: the loss
    trajectories must track (optimizer + loss + backward all agree over
    time, not just at one point). Weights are transplanted BEFORE the TF
    optimizer mutates them; plain Adam with matched (lr, b1, b2, eps)
    isolates framework math from schedule details. Models run in eval mode
    (see module docstring on unseeded reference dropout)."""
    import optax
    from tfsr.model.sequence_router_naive import SequenceRouter as RefSRF

    from srf_tpu.models.srf import SequenceRouter

    config = _ref_config()
    ref = RefSRF(config, _Log(), class_n=8)
    rng = np.random.RandomState(7)
    feats, inp_len, labels, tar_len = _batch(rng)
    ref.call(tf.constant(feats), input_lengths=tf.constant(inp_len, tf.float32),
             training=False)

    model = SequenceRouter(
        feat_dim=12, class_n=8, enc_num=3, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4, caps_class_dim=4,
        caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=4, caps_type="naive",
        inp_dropout=0.0, inn_dropout=0.0, init_name="glorot_uniform",
    )
    variables = model.init(
        {"params": KEY, "dropout": KEY}, jnp.asarray(feats),
        jnp.asarray(inp_len), False,
    )
    params = tp.transplant_srf_naive(ref, variables["params"], enc_num=3)
    batch_stats = {"conv_feat": tp.convfe_batch_stats(ref.conv, 2)}

    lr, b1, b2, eps = 1e-3, 0.9, 0.98, 1e-9
    tf_opt = tf_keras.optimizers.legacy.Adam(
        learning_rate=lr, beta_1=b1, beta_2=b2, epsilon=eps
    )
    tf_losses = []
    for _ in range(5):
        with tf.GradientTape() as tape:
            y = ref.call(tf.constant(feats),
                         input_lengths=tf.constant(inp_len, tf.float32),
                         training=False)
            pe = tf.nn.ctc_loss(
                tf.constant(labels), y, tf.constant(tar_len),
                tf.math.ceil(tf.constant(inp_len, tf.float32) / 4),
                logits_time_major=False, blank_index=7,
            )
            loss = tf.nn.compute_average_loss(pe, global_batch_size=2)
        grads = tape.gradient(loss, ref.trainable_variables)
        tf_opt.apply_gradients(zip(grads, ref.trainable_variables))
        tf_losses.append(float(loss))

    tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = model.apply(
            {"params": p, "batch_stats": batch_stats},
            jnp.asarray(feats), jnp.asarray(inp_len), False,
        )
        pe = ctc_loss_from_frames(
            logits, jnp.asarray(inp_len), 4, jnp.asarray(labels),
            jnp.asarray(tar_len),
        )
        return jnp.sum(pe) / 2.0

    jax_losses = []
    for _ in range(5):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, tf_losses, rtol=3e-3)


def _phone_corpus(rng, n_utt, frames, feat_dim, n_classes, span=8):
    """Learnable synthetic corpus: each utterance is a sequence of phones,
    each phone a characteristic random direction in feature space + noise.
    Returns (feats [N,T,F], labels [N,L], tar_len [N])."""
    dirs = rng.randn(n_classes + 1, feat_dim).astype(np.float32) * 2.0
    n_phones = frames // span
    feats = np.zeros((n_utt, frames, feat_dim), np.float32)
    labels = np.zeros((n_utt, n_phones), np.int32)
    for u in range(n_utt):
        seq = rng.randint(1, n_classes + 1, size=n_phones)
        labels[u] = seq
        for p, cls in enumerate(seq):
            feats[u, p * span:(p + 1) * span] = dirs[cls]
    feats += rng.randn(*feats.shape).astype(np.float32) * 0.3
    return feats, labels, np.full((n_utt,), n_phones, np.int32)


def _greedy_collapse(logits, blank):
    """Greedy CTC: argmax -> collapse repeats -> drop blanks."""
    ids = np.argmax(logits, axis=-1)
    out = []
    for row in ids:
        seq, prev = [], -1
        for t in row:
            if t != prev and t != blank:
                seq.append(int(t))
            prev = t
        out.append(tuple(seq))
    return out


def test_srf_convergence_parity():
    """LONG-HORIZON parity: both frameworks train the same tiny SRF from
    identical (transplanted) weights on the same learnable multi-batch
    corpus for 30 epochs (120 compiled Adam steps). The loss trajectories
    must track while gradients are informative, both must reach the same
    low-loss end state, and the end-state greedy decodes on held-out
    utterances must agree utterance-for-utterance. This is the strongest
    pre-real-data accuracy evidence available: it exercises loss, backward,
    optimizer and data-order effects jointly over time, not at one point
    (reference train step: tfsr/trainer_sr.py:41-75).

    Per-step float drift compounds chaotically once the loss is tiny, so
    late steps are compared through the end state (loss level + decodes),
    not step-by-step values."""
    import optax
    from tfsr.model.sequence_router_naive import SequenceRouter as RefSRF

    from srf_tpu.models.srf import SequenceRouter

    n_classes, feat_dim, frames, batch = 6, 12, 24, 4
    blank = 7  # class_n=8: PAD 0, phones 1..6, blank appended = 7
    rng = np.random.RandomState(11)
    feats, labels, tar_len = _phone_corpus(
        rng, n_utt=16, frames=frames, feat_dim=feat_dim, n_classes=n_classes
    )
    train, held = slice(0, 12), slice(12, 16)
    inp_len = np.full((batch,), frames, np.int32)
    n_batches = 12 // batch
    epochs = 30

    config = _ref_config()
    ref = RefSRF(config, _Log(), class_n=8)
    ref.call(tf.constant(feats[:batch]),
             input_lengths=tf.constant(inp_len, tf.float32), training=False)

    model = SequenceRouter(
        feat_dim=feat_dim, class_n=8, enc_num=3, caps_primary_num=6,
        caps_primary_dim=4, caps_conv_num=5, caps_conv_dim=4,
        caps_class_dim=4, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=4, caps_type="naive",
        inp_dropout=0.0, inn_dropout=0.0, init_name="glorot_uniform",
    )
    variables = model.init(
        {"params": KEY, "dropout": KEY}, jnp.asarray(feats[:batch]),
        jnp.asarray(inp_len), False,
    )
    params = tp.transplant_srf_naive(ref, variables["params"], enc_num=3)
    batch_stats = {"conv_feat": tp.convfe_batch_stats(ref.conv, 2)}

    lr, b1, b2, eps = 8e-3, 0.9, 0.98, 1e-9
    tf_opt = tf_keras.optimizers.legacy.Adam(
        learning_rate=lr, beta_1=b1, beta_2=b2, epsilon=eps
    )
    inp_len_tf = tf.constant(inp_len, tf.float32)

    @tf.function
    def tf_step(bf, bl, btl):
        with tf.GradientTape() as tape:
            y = ref.call(bf, input_lengths=inp_len_tf, training=False)
            pe = tf.nn.ctc_loss(
                bl, y, btl, tf.math.ceil(inp_len_tf / 4),
                logits_time_major=False, blank_index=blank,
            )
            loss = tf.nn.compute_average_loss(pe, global_batch_size=batch)
        grads = tape.gradient(loss, ref.trainable_variables)
        tf_opt.apply_gradients(zip(grads, ref.trainable_variables))
        return loss

    tf_losses = []
    for _ in range(epochs):
        for b in range(n_batches):
            sl = slice(train.start + b * batch, train.start + (b + 1) * batch)
            tf_losses.append(float(tf_step(
                tf.constant(feats[sl]), tf.constant(labels[sl]),
                tf.constant(tar_len[sl]),
            )))

    tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    opt_state = tx.init(params)

    def loss_fn(p, bf, bl, btl):
        logits = model.apply(
            {"params": p, "batch_stats": batch_stats},
            bf, jnp.asarray(inp_len), False,
        )
        pe = ctc_loss_from_frames(logits, jnp.asarray(inp_len), 4, bl, btl)
        return jnp.sum(pe) / batch

    @jax.jit
    def jax_step(p, o, bf, bl, btl):
        loss, grads = jax.value_and_grad(loss_fn)(p, bf, bl, btl)
        updates, o = tx.update(grads, o, p)
        return jax.tree.map(lambda a, u: a + u, p, updates), o, loss

    jax_losses = []
    for _ in range(epochs):
        for b in range(n_batches):
            sl = slice(train.start + b * batch, train.start + (b + 1) * batch)
            params, opt_state, loss = jax_step(
                params, opt_state, jnp.asarray(feats[sl]),
                jnp.asarray(labels[sl]), jnp.asarray(tar_len[sl]),
            )
            jax_losses.append(float(loss))

    # 1. trajectories track step-for-step while gradients are informative
    np.testing.assert_allclose(jax_losses[:12], tf_losses[:12], rtol=2e-2)
    # 2. same end state: final-epoch mean losses agree and are low
    tf_final = float(np.mean(tf_losses[-n_batches:]))
    jax_final = float(np.mean(jax_losses[-n_batches:]))
    assert jax_final < 0.8 and tf_final < 0.8, (jax_final, tf_final)
    assert abs(jax_final - tf_final) <= 0.1 + 0.25 * tf_final, (
        jax_final, tf_final,
    )

    # 3. end-state greedy decodes AGREE BETWEEN FRAMEWORKS on held-out
    # utterances (the tiny model need not generalize perfectly — the claim
    # is that both frameworks land on the same function)
    def _decode_both(sl):
        fl = np.full((sl.stop - sl.start,), frames, np.float32)
        ref_logits = ref.call(
            tf.constant(feats[sl]), input_lengths=tf.constant(fl),
            training=False,
        ).numpy()
        our_logits = np.asarray(model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(feats[sl]), jnp.asarray(fl.astype(np.int32)), False,
        ))
        return (_greedy_collapse(ref_logits, blank),
                _greedy_collapse(our_logits, blank))

    ref_dec, our_dec = _decode_both(held)
    agree = sum(a == b for a, b in zip(ref_dec, our_dec))
    assert agree >= 3, (ref_dec, our_dec)
    # 4. both actually learned the task (train-set decodes correct)
    ref_tr, our_tr = _decode_both(slice(0, 4))
    truth = [tuple(map(int, row)) for row in labels[:4]]
    assert sum(a == t for a, t in zip(our_tr, truth)) >= 3, (our_tr, truth)
    assert sum(a == t for a, t in zip(ref_tr, truth)) >= 3, (ref_tr, truth)
