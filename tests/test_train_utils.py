"""Unit tests: Noam schedule math, bucket geometry, metrics, losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srf_tpu.data.bucketing import get_bucket_info, round_batch_sizes
from srf_tpu.train.losses import loss_ce, loss_ewerr, ppl
from srf_tpu.train.optimizer import noam_schedule
from srf_tpu.utils.metrics import MeanMetric, SumMetric


def test_noam_schedule_formula():
    sched = noam_schedule(train_lr_param_k=10, d_model=256, warmup_steps=36111)
    for step in [1, 100, 36111, 100000]:
        expected = min(
            10 * 256**-0.5 * min(step**-0.5, step * 36111**-1.5), 10.0
        )
        np.testing.assert_allclose(
            float(sched(jnp.asarray(step))), expected, rtol=1e-5
        )
    # warmup peak at warmup_steps
    assert float(sched(jnp.asarray(36111))) >= float(sched(jnp.asarray(20000)))
    assert float(sched(jnp.asarray(36111))) >= float(sched(jnp.asarray(80000)))


def test_bucket_info_reference_selftest_shape():
    # reference self-test call (train_helper.py:414): budget 20000, 2 gpus,
    # boundaries 200..1000 step 100
    boundaries, batches = get_bucket_info(20000, 2, 200, 1000, 100)
    assert len(batches) == len(boundaries) + 1
    # batch_size * boundary stays within the frame budget
    for boundary, batch in zip(boundaries, batches):
        assert batch * boundary <= 20000
        assert batch > 2
    assert batches[-1] == 2
    # boundaries strictly increasing, batch sizes strictly decreasing (dedup)
    assert boundaries == sorted(boundaries)
    assert batches == sorted(batches, reverse=True)
    assert len(set(batches)) == len(batches)


def test_bucket_info_timit_budget():
    boundaries, batches = get_bucket_info(7000, 1, 241, 10000, 150)
    assert boundaries[0] == 241 and batches[0] == 29  # floor(7000/241)
    rounded = round_batch_sizes(batches, 8)
    assert all(b % 8 == 0 or b == 8 for b in rounded)


def test_metrics():
    m = MeanMetric()
    m.update(10, 2)
    m.update(2, 2)
    assert m.result() == 3.0
    s = SumMetric()
    s.update(3)
    s.update(4)
    assert s.result() == 7.0


def test_loss_ce_neighbor_masks_padding():
    labels = jnp.array([[1, 2, 0]])
    logits = jnp.zeros((1, 3, 5))
    out = loss_ce("neighbor", labels, logits, 0.8, 5)
    assert out.shape == (1, 3)
    assert float(out[0, 2]) == 0.0  # padded position
    assert float(out[0, 0]) > 0


def test_loss_ce_label_smoothing_zero_at_perfect():
    labels = jnp.array([[2]])
    logits = jnp.full((1, 1, 4), -20.0).at[0, 0, 2].set(20.0)
    out = loss_ce("label", labels, logits, 0.9, 4)
    # near-perfect prediction: loss ~ norm-const-adjusted small value
    assert float(out[0, 0]) < 4.0


def test_loss_ewerr_zero_when_all_equal():
    errs = jnp.array([[2.0, 2.0, 2.0]])
    lprobs = jnp.log(jnp.array([[0.5, 0.3, 0.2]]))
    np.testing.assert_allclose(float(loss_ewerr(errs, lprobs)[0]), 0.0,
                               atol=1e-6)
    # better hypotheses with lower error -> negative expected advantage
    errs2 = jnp.array([[0.0, 2.0, 4.0]])
    assert float(loss_ewerr(errs2, lprobs)[0]) < 0


def test_loss_ewerr_stable_at_real_utterance_nll():
    """Real utterances have hypothesis NLLs of hundreds of nats; the beam
    renormalization must not underflow to 0/0 = NaN (it is a softmax, so
    only RELATIVE log-probs matter)."""
    errs = jnp.array([[0.0, 2.0, 4.0]])
    lprobs_small = jnp.log(jnp.array([[0.5, 0.3, 0.2]]))
    want = float(loss_ewerr(errs, lprobs_small)[0])
    got = float(loss_ewerr(errs, lprobs_small - 400.0)[0])
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # gradient stays finite too
    g = jax.grad(lambda lp: jnp.sum(loss_ewerr(errs, lp)))(
        lprobs_small - 400.0
    )
    assert np.all(np.isfinite(np.asarray(g)))


def test_ppl_masked():
    logits = jnp.zeros((1, 4, 3))
    labels = jnp.array([[0, 1, 2, 1]])
    full = float(ppl(labels, logits, jnp.array([4])))
    half = float(ppl(labels, logits, jnp.array([2])))
    np.testing.assert_allclose(full, 4 * np.log(3), rtol=1e-5)
    np.testing.assert_allclose(half, 2 * np.log(3), rtol=1e-5)


def test_loss_function_w2v_matches_bce():
    import numpy as np
    import jax.numpy as jnp
    from srf_tpu.train.losses import loss_function_w2v

    rng = np.random.RandomState(0)
    real = (rng.rand(3, 5) > 0.5).astype(np.float32)
    pred = rng.randn(3, 5).astype(np.float32)
    weights = rng.rand(3).astype(np.float32)
    got = float(loss_function_w2v(jnp.asarray(real), jnp.asarray(pred),
                                  jnp.asarray(weights)))
    # independent numpy BCE-from-logits oracle
    p = 1.0 / (1.0 + np.exp(-pred))
    bce = -(real * np.log(p + 1e-12) + (1 - real) * np.log(1 - p + 1e-12))
    want = float(np.sum(np.mean(bce, axis=-1) * weights))
    assert abs(got - want) < 1e-4


def test_shuffle_data_permutes():
    from srf_tpu.train.losses import shuffle_data

    texts = ["a", "b", "c", "d", "e"]
    out = shuffle_data(texts, seed=3)
    assert sorted(out) == sorted(texts)
    assert shuffle_data(texts, seed=3) == out
