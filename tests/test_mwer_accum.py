"""MWER under gradient accumulation (VERDICT r2 item 9).

The MWER update's two loss terms are sums of per-example terms divided by
the global batch, so accumulating gradients over microbatches must produce
the SAME optimizer update as the full-batch step on a BN-free,
dropout-free model.
"""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from srf_tpu.models.lstm import LstmEncoder
from srf_tpu.train.mwer import make_mwer_train_step
from srf_tpu.train.state import TrainState
from srf_tpu.train.step import make_apply_fn, make_logits_fn

FEAT = 8
VOCAB = 5  # + blank appended


def _setup():
    model = LstmEncoder(
        num_layers=1, d_model=16, vocab_n=VOCAB + 1, feat_dim=FEAT,
        bidirectional=False, is_cnnfe=False, input_dropout=0.0,
        inner_dropout=0.0,
    )
    rng = jax.random.PRNGKey(3)
    host = np.random.RandomState(7)
    batch = {
        "feats": jnp.asarray(host.randn(4, 20, FEAT), jnp.float32),
        "labels": jnp.asarray(host.randint(1, VOCAB, size=(4, 5))).astype(jnp.int32),
        "inp_len": jnp.asarray([20, 17, 14, 19], jnp.int32),
        "tar_len": jnp.asarray([5, 4, 3, 5], jnp.int32),
    }
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["feats"], batch["inp_len"],
        False,
    )
    tx = optax.adam(1e-3)
    state = TrainState.create(variables["params"], tx, {})
    apply_fn = make_apply_fn(model)
    return apply_fn, tx, state, batch, rng


def test_mwer_accum_matches_full_batch():
    apply_fn, tx, state, batch, rng = _setup()
    logits_fn = make_logits_fn(apply_fn)
    kw = dict(in_len_div=1, beam_width=4, n_best=3, blank_id=VOCAB + 1,
              lam_ctc=0.1)
    step_full = make_mwer_train_step(apply_fn, logits_fn, tx, **kw)
    step_accum = make_mwer_train_step(apply_fn, logits_fn, tx,
                                      accum_steps=2, **kw)

    s1, m1 = step_full(state, batch, rng)
    s2, m2 = step_accum(state, batch, rng)
    np.testing.assert_allclose(
        float(m1["loss_sum"]), float(m2["loss_sum"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_mwer_accum_indivisible_batch_degrades_to_divisor():
    apply_fn, tx, state, batch, rng = _setup()
    logits_fn = make_logits_fn(apply_fn)
    # batch 4 with accum 3 -> largest divisor 2 (same policy as step.py);
    # must still run and stay finite
    step = make_mwer_train_step(
        apply_fn, logits_fn, tx, in_len_div=1, beam_width=4, n_best=3,
        blank_id=VOCAB + 1, lam_ctc=0.1, accum_steps=3,
    )
    s, m = step(state, batch, rng)
    assert np.isfinite(float(m["loss_sum"]))
