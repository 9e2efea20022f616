"""Pallas fused-SDR kernel vs the XLA scan implementation (interpret mode
on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srf_tpu.ops.routing import sequential_routing
from srf_tpu.ops.routing_pallas import sequential_routing_pallas


def _problem(seed=0, B=4, T=7, in_n=6, in_d=4, out_n=5, out_d=4):
    rng = np.random.RandomState(seed)
    u = jnp.asarray(rng.randn(B, T, in_n, in_d), jnp.float32)
    W = jnp.asarray(rng.randn(in_n, out_n, out_d, in_d) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(in_n, out_n, out_d) * 0.1, jnp.float32)
    return u, W, b


@pytest.mark.parametrize("num_iter,mask", [(1, True), (2, False)])
def test_pallas_sdr_matches_xla(num_iter, mask):
    u, W, b = _problem()
    want = sequential_routing(u, W, b, num_iter, mask)
    got = sequential_routing_pallas(u, W, b, num_iter, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pallas_sdr_batch_tiling():
    u, W, b = _problem(B=6)
    full = sequential_routing_pallas(u, W, b, 1, True, None)
    tiled = sequential_routing_pallas(u, W, b, 1, True, 2)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full), atol=1e-5)


@pytest.mark.parametrize("mask,num_iter", [(True, 1), (False, 1), (True, 2)])
def test_pallas_sdr_gradients_match_xla(mask, num_iter):
    """num_iter==1 exercises the fused Pallas backward kernel; num_iter==2
    the XLA-scan VJP fallback."""
    u, W, b = _problem(B=3, T=6)

    def loss_pallas(u, W, b):
        out = sequential_routing_pallas(u, W, b, num_iter, mask)
        return jnp.sum(out**2) + jnp.sum(out[:, -1])

    def loss_xla(u, W, b):
        out = sequential_routing(u, W, b, num_iter, mask)
        return jnp.sum(out**2) + jnp.sum(out[:, -1])

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(u, W, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(u, W, b)
    for a, e in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=1e-5)
