"""Fused hardware-PRNG dropout (ops/dropout_pallas.py): semantics.

On CPU this exercises the XLA fallback path; SRF_TEST_PLATFORM=axon
compiles the real Pallas kernel on the chip. Both satisfy the same
contract: distributionally standard inverted dropout, deterministic in
(seed, shape), seed-dependent, and the backward mask is IDENTICAL to the
forward one (the kernel regenerates it from the 4-byte seed alone — no
residual tensor)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srf_tpu.ops.dropout_pallas import fused_dropout

SEED = jnp.uint32(1234)


@pytest.fixture(scope="module")
def x():
    return jnp.asarray(
        np.random.RandomState(0).randn(4, 37, 50).astype(np.float32)
    )


def test_keep_fraction_and_scale(x):
    y = fused_dropout(x, SEED, 0.2)
    kept = float(jnp.mean(y != 0))
    assert abs(kept - 0.8) < 0.03
    ratio = jnp.where(y != 0, y / x, 1.25)
    np.testing.assert_allclose(np.asarray(ratio), 1.25, atol=1e-5)


def test_deterministic_and_seed_dependent(x):
    a = fused_dropout(x, SEED, 0.2)
    b = fused_dropout(x, SEED, 0.2)
    c = fused_dropout(x, jnp.uint32(99), 0.2)
    assert bool(jnp.all(a == b))
    assert not bool(jnp.all((a != 0) == (c != 0)))


def test_backward_regenerates_identical_mask(x):
    y = fused_dropout(x, SEED, 0.2)
    g = jax.grad(lambda x: jnp.sum(fused_dropout(x, SEED, 0.2) * 3.0))(x)
    assert bool(jnp.all((y != 0) == (g != 0)))
    np.testing.assert_allclose(
        np.asarray(jnp.where(g != 0, g, 3.75)), 3.75, atol=1e-5
    )


def test_rate_zero_identity(x):
    y = fused_dropout(x, SEED, 0.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    g = jax.grad(lambda x: jnp.sum(fused_dropout(x, SEED, 0.0)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_jit_and_odd_sizes():
    # sizes straddling the 1024-lane padding boundary
    for n in (1023, 1024, 1025, 5000):
        x = jnp.ones((n,), jnp.float32)
        y = jax.jit(lambda x: fused_dropout(x, SEED, 0.5))(x)
        assert y.shape == (n,)
        vals = np.unique(np.asarray(y))
        assert set(vals.tolist()) <= {0.0, 2.0}


def test_cnn_dropout_impl_flag_reaches_model():
    """--tpu-dropout-kernel plumbs through from_config; eval forwards are
    impl-independent (dropout off); train forwards differ (different
    stream) but stay finite; grads flow through the fused path."""
    from srf_tpu.models.cnn import CNNStrideEncoder

    feats = jnp.asarray(
        np.random.RandomState(1).randn(2, 32, 12).astype(np.float32)
    )
    lens = jnp.array([32, 24], jnp.int32)
    rng = jax.random.PRNGKey(0)
    kwargs = dict(enc_num=5, class_n=7, feat_dim=12, nfilt_inp=8,
                  nfilt_inn=8, proj_layers=2, proj_dim=16,
                  conv_layer_num=2, conv_filter_num=4)
    m_xla = CNNStrideEncoder(**kwargs, dropout_impl="xla")
    m_pl = CNNStrideEncoder(**kwargs, dropout_impl="pallas")
    variables = m_xla.init({"params": rng, "dropout": rng}, feats, lens, False)
    ev_x = m_xla.apply(variables, feats, lens, False)
    ev_p = m_pl.apply(variables, feats, lens, False)
    np.testing.assert_array_equal(np.asarray(ev_x), np.asarray(ev_p))

    def loss(params, model):
        out, _ = model.apply(
            {**variables, "params": params}, feats, lens, True,
            rngs={"dropout": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )
        return jnp.sum(out * out)

    for model in (m_xla, m_pl):
        val, grads = jax.value_and_grad(loss)(variables["params"], model)
        assert np.isfinite(float(val))
        assert all(
            bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads)
        )


def test_registry_validates_dropout_kernel():
    from types import SimpleNamespace

    from srf_tpu.models.registry import validate_dropout_kernel

    cfg = SimpleNamespace(tpu_dropout_kernel="pallas")
    assert validate_dropout_kernel(cfg, "cnn") == "pallas"
    with pytest.raises(ValueError, match="CNN family only"):
        validate_dropout_kernel(cfg, "srf")
    with pytest.raises(ValueError, match="unknown"):
        validate_dropout_kernel(
            SimpleNamespace(tpu_dropout_kernel="typo"), "cnn"
        )
