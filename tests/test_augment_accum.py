"""SpecAugment + gradient accumulation (TPU-side training utilities).

Both are capability beyond parity (the reference has neither); the
contracts tested here are the ones training correctness rests on:
SpecAugment never touches padding and only fires in training mode;
accumulated gradients reproduce the full-batch update exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srf_tpu.ops.specaugment import spec_augment

KEY = jax.random.PRNGKey(42)


def test_specaug_masks_inside_valid_region_only():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(np.abs(rng.randn(3, 50, 12)) + 1.0, jnp.float32)
    lens = jnp.asarray([50, 30, 10])
    out = np.asarray(spec_augment(feats, lens, KEY, time_masks=2,
                                  time_width=20, freq_masks=1, freq_width=4))
    # padded frames (>= len) are untouched (here: nonzero input stays)
    for b, n in enumerate([50, 30, 10]):
        np.testing.assert_array_equal(out[b, n:], np.asarray(feats)[b, n:])
    # something was actually masked somewhere (prob of all-empty masks ~0)
    assert (out == 0.0).sum() > 0


def test_specaug_mask_geometry():
    """Zeroed entries form full-row (time) or full-column (freq) stripes."""
    feats = jnp.ones((2, 40, 16), jnp.float32)
    lens = jnp.asarray([40, 25])
    out = np.asarray(spec_augment(feats, lens, KEY, time_masks=1,
                                  time_width=10, freq_masks=1, freq_width=5))
    for b in range(2):
        valid = out[b, : int(lens[b])]
        # a position is zero iff its row is time-masked or col freq-masked
        zero_rows = (valid == 0).all(axis=1)
        zero_cols = (valid == 0).all(axis=0)
        recon = np.zeros_like(valid, bool)
        recon[zero_rows] = True
        recon[:, zero_cols] = True
        np.testing.assert_array_equal(valid == 0, recon)


def test_specaug_deterministic_per_key():
    feats = jnp.ones((2, 30, 8), jnp.float32)
    lens = jnp.asarray([30, 30])
    a = spec_augment(feats, lens, KEY)
    b = spec_augment(feats, lens, KEY)
    c = spec_augment(feats, lens, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def _tiny_setup(batch=4):
    """BatchNorm-free model (LSTM, no conv front-end): exact accumulated ==
    full-batch equality only holds without batch statistics — BN models
    normalize each microbatch by its own stats (the standard, documented
    grad-accum caveat)."""
    import optax

    from srf_tpu.models.lstm import LstmEncoder
    from srf_tpu.train.state import TrainState
    from srf_tpu.train.step import make_apply_fn

    model = LstmEncoder(
        num_layers=1, d_model=8, vocab_n=6, feat_dim=8,
        input_dropout=0.0, inner_dropout=0.0, is_cnnfe=False,
    )
    host = np.random.RandomState(0)
    lens = np.array([20, 17, 20, 15], np.int32)[:batch]
    data = {
        "feats": jnp.asarray(host.randn(batch, 20, 8), jnp.float32),
        "labels": jnp.asarray(host.randint(1, 5, size=(batch, 4)), jnp.int32),
        "inp_len": jnp.asarray(lens),
        "tar_len": jnp.asarray([4, 3, 4, 2][:batch]),
    }
    variables = model.init(
        {"params": KEY, "dropout": KEY}, data["feats"][:1],
        data["inp_len"][:1], False,
    )
    tx = optax.adam(1e-3)
    state = TrainState.create(
        variables["params"], tx, variables.get("batch_stats", {})
    )
    return make_apply_fn(model), tx, state, data


@pytest.mark.parametrize("accum", [2, 4])
def test_grad_accum_matches_full_batch(accum):
    """accum-step update == full-batch update (loss, params) with
    deterministic (no-dropout) models."""
    from srf_tpu.train.step import make_train_step

    apply_fn, tx, state, data = _tiny_setup()
    full = make_train_step(apply_fn, tx, 2, mesh=None, donate=False)
    acc = make_train_step(apply_fn, tx, 2, mesh=None, donate=False,
                          accum_steps=accum)
    s1, m1 = full(state, data, KEY)
    s2, m2 = acc(state, data, KEY)
    np.testing.assert_allclose(float(m1["loss_sum"]), float(m2["loss_sum"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_grad_accum_indivisible_degrades():
    """batch=4 with accum=3 silently uses the largest divisor (2)."""
    from srf_tpu.train.step import make_train_step

    apply_fn, tx, state, data = _tiny_setup()
    acc = make_train_step(apply_fn, tx, 2, mesh=None, donate=False,
                          accum_steps=3)
    s, m = acc(state, data, KEY)
    assert np.isfinite(float(m["loss_sum"]))


def test_grad_accum_under_mesh():
    """accum composes with the DP mesh (8 virtual devices)."""
    from srf_tpu.parallel.mesh import make_mesh, shard_batch
    from srf_tpu.train.step import make_train_step

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    apply_fn, tx, state, data = _tiny_setup()
    data = {  # pad batch to 8 so each microbatch still shards 8 ways
        k: jnp.concatenate([v, v], axis=0) for k, v in data.items()
    }
    mesh = make_mesh(num_data=8)
    full = make_train_step(apply_fn, tx, 2, mesh=mesh, donate=False)
    acc = make_train_step(apply_fn, tx, 2, mesh=mesh, donate=False,
                          accum_steps=2)
    sharded = shard_batch(mesh, data)
    s1, m1 = full(state, sharded, KEY)
    s2, m2 = acc(state, sharded, KEY)
    np.testing.assert_allclose(float(m1["loss_sum"]), float(m2["loss_sum"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("bf16,accum,specaug", [
    (True, 2, False), (False, 2, True), (True, 1, True), (True, 2, True),
])
def test_flag_combinations_smoke(bf16, accum, specaug):
    """bf16 x grad-accum x SpecAugment compose: one train step runs,
    loss finite, params move."""
    import types

    import jax

    from srf_tpu.ops.specaugment import make_augment_fn
    from srf_tpu.train.step import make_apply_fn, make_train_step

    apply_plain, tx, state, data = _tiny_setup()
    from srf_tpu.models.lstm import LstmEncoder

    model = LstmEncoder(
        num_layers=1, d_model=8, vocab_n=6, feat_dim=8,
        input_dropout=0.0, inner_dropout=0.0, is_cnnfe=False,
    )
    cfg = types.SimpleNamespace(
        tpu_specaug=specaug, tpu_specaug_time_masks=2,
        tpu_specaug_time_width=8, tpu_specaug_freq_masks=1,
        tpu_specaug_freq_width=3,
    )
    apply_fn = make_apply_fn(model, bf16=bf16,
                             augment_fn=make_augment_fn(cfg))
    step = make_train_step(apply_fn, tx, 2, mesh=None, donate=False,
                           accum_steps=accum)
    new_state, metrics = step(state, data, KEY)
    assert np.isfinite(float(metrics["loss_sum"]))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new_state.params))
    )
    assert moved


def test_specaug_only_in_training_mode():
    """augment_fn must not perturb eval logits."""
    import types

    from srf_tpu.models.lstm import LstmEncoder
    from srf_tpu.ops.specaugment import make_augment_fn
    from srf_tpu.train.step import make_apply_fn

    apply_plain, tx, state, data = _tiny_setup()
    # rebuild the same model with an aggressive augment_fn attached
    model = LstmEncoder(
        num_layers=1, d_model=8, vocab_n=6, feat_dim=8,
        input_dropout=0.0, inner_dropout=0.0, is_cnnfe=False,
    )
    cfg = types.SimpleNamespace(
        tpu_specaug=True, tpu_specaug_time_masks=3, tpu_specaug_time_width=15,
        tpu_specaug_freq_masks=2, tpu_specaug_freq_width=4,
    )
    aug_apply = make_apply_fn(model, augment_fn=make_augment_fn(cfg))
    eval_plain, _ = apply_plain(state.params, state.batch_stats, data,
                                False, None)
    eval_aug, _ = aug_apply(state.params, state.batch_stats, data,
                            False, None)
    np.testing.assert_array_equal(np.asarray(eval_plain),
                                  np.asarray(eval_aug))
    # and in training mode it DOES change the result
    train_plain, _ = apply_plain(state.params, state.batch_stats, data,
                                 True, KEY)
    train_aug, _ = aug_apply(state.params, state.batch_stats, data,
                             True, KEY)
    assert not np.allclose(np.asarray(train_plain), np.asarray(train_aug))
