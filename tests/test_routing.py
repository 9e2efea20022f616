"""Numeric tests for the routing core against an independent numpy oracle.

The oracle re-derives the reference equations (squash, DR iteration, SDR
time recurrence, PAD-capsule mask, windowing) directly from the math in
SURVEY.md §2.5 / the reference's routing bodies, written in plain numpy with
loops — deliberately a different implementation shape from the XLA version.
"""

import numpy as np
import jax.numpy as jnp

from srf_tpu.ops.routing import (
    dynamic_routing,
    predict_capsules,
    route_layer,
    sequential_routing,
    window_stack,
)
from srf_tpu.ops.squash import capsule_length, squash


def np_squash(s, axis=-1, eps=1e-7):
    sq = np.sum(np.square(s), axis=axis, keepdims=True)
    return (sq / (1.0 + sq)) * (s / np.sqrt(sq + eps))


def np_softmax(x, axis):
    e = np.exp(x - np.max(x, axis=axis, keepdims=True))
    return e / np.sum(e, axis=axis, keepdims=True)


def np_u_hat(u, W, b):
    B, T, in_n, in_d = u.shape
    _, out_n, out_d, _ = W.shape
    out = np.zeros((B, T, in_n, out_n, out_d))
    for bi in range(B):
        for t in range(T):
            for n in range(in_n):
                for o in range(out_n):
                    out[bi, t, n, o] = W[n, o] @ u[bi, t, n] + b[n, o]
    return out


def np_dr(u_hat, num_iter, mask_last):
    B, T, in_n, out_n, out_d = u_hat.shape
    b = np.zeros((B, T, in_n, out_n))
    mask = np.zeros((out_n,))
    if mask_last:
        mask[0] = -1e9
    v = None
    for _ in range(num_iter):
        b = b + mask
        c = np_softmax(b, axis=3)
        s = np.einsum("btno,btnoi->btoi", c, u_hat)
        v = np_squash(s, axis=-1)
        b = b + np.einsum("btnoi,btoi->btno", u_hat, v)
    return v


def np_sdr(u, W, bias, num_iter, mask_last):
    B, T, in_n, in_d = u.shape
    _, out_n, out_d, _ = W.shape
    mask = np.zeros((out_n,))
    if mask_last:
        mask[0] = -1e9
    v = np.zeros((B, out_n, out_d))
    vs = np.zeros((B, T, out_n, out_d))
    for t in range(T):
        u_hat_t = np_u_hat(u[:, t : t + 1], W, bias)[:, 0]
        b = np.zeros((B, in_n, out_n))
        for _ in range(num_iter):
            b = b + np.einsum("bnoi,boi->bno", u_hat_t, v) + mask
            c = np_softmax(b, axis=2)
            s = np.einsum("bno,bnoi->boi", c, u_hat_t)
            v = np_squash(s, axis=-1)
        vs[:, t] = v
    return vs


def _rand_problem(seed=0, B=2, T=5, in_n=6, in_d=3, out_n=4, out_d=3):
    rng = np.random.RandomState(seed)
    u = rng.randn(B, T, in_n, in_d).astype(np.float32)
    W = (rng.randn(in_n, out_n, out_d, in_d) * 0.1).astype(np.float32)
    b = (rng.randn(in_n, out_n, out_d) * 0.1).astype(np.float32)
    return u, W, b


def test_squash_matches_reference_formula():
    rng = np.random.RandomState(0)
    s = rng.randn(3, 4, 5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(squash(jnp.asarray(s), axis=-1)), np_squash(s), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(capsule_length(jnp.asarray(s))),
        np.sqrt(np.sum(s**2, -1) + 1e-7),
        rtol=1e-5,
    )


def test_predict_capsules_matches_oracle():
    u, W, b = _rand_problem()
    got = np.asarray(predict_capsules(jnp.asarray(u), jnp.asarray(W), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_u_hat(u, W, b), rtol=1e-4, atol=1e-5)


def test_dr_matches_oracle():
    u, W, b = _rand_problem(1)
    u_hat = predict_capsules(jnp.asarray(u), jnp.asarray(W), jnp.asarray(b))
    for num_iter, mask_last in [(1, False), (3, True)]:
        got = np.asarray(dynamic_routing(u_hat, num_iter, mask_last))
        want = np_dr(np_u_hat(u, W, b), num_iter, mask_last)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sdr_matches_oracle():
    u, W, b = _rand_problem(2)
    for num_iter, mask_last in [(1, True), (2, False)]:
        got = np.asarray(
            sequential_routing(
                jnp.asarray(u), jnp.asarray(W), jnp.asarray(b), num_iter, mask_last
            )
        )
        want = np_sdr(u, W, b, num_iter, mask_last)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sdr_chunked_equals_plain():
    u, W, b = _rand_problem(3, T=11)
    plain = sequential_routing(jnp.asarray(u), jnp.asarray(W), jnp.asarray(b), 1, True)
    chunked = sequential_routing(
        jnp.asarray(u), jnp.asarray(W), jnp.asarray(b), 1, True, time_chunk=4
    )
    np.testing.assert_allclose(np.asarray(plain), np.asarray(chunked), atol=1e-5)


def test_sdr_precompute_equals_plain():
    u, W, b = _rand_problem(3, T=11)
    plain = sequential_routing(jnp.asarray(u), jnp.asarray(W), jnp.asarray(b), 1, True)
    for remat in (False, True):
        pre = sequential_routing(
            jnp.asarray(u), jnp.asarray(W), jnp.asarray(b), 1, True,
            precompute=True, remat=remat,
        )
        np.testing.assert_allclose(np.asarray(plain), np.asarray(pre), atol=1e-5)


def test_sdr_flat_layout_equals_plain():
    # lane-major (flat) layout: same math, different f32 op order; the
    # squash near |s|~0 conditions the comparison to ~1e-3 (both impls sit
    # within that of a float64 oracle)
    from srf_tpu.ops.routing import _sequential_routing_flat

    u, W, b = _rand_problem(3, T=11)
    for num_iter, mask_last in [(1, True), (2, False)]:
        plain = sequential_routing(
            jnp.asarray(u), jnp.asarray(W), jnp.asarray(b), num_iter, mask_last
        )
        flat = _sequential_routing_flat(
            jnp.asarray(u), jnp.asarray(W), jnp.asarray(b), num_iter, mask_last
        )
        np.testing.assert_allclose(
            np.asarray(plain), np.asarray(flat), atol=3e-3
        )


def test_window_stack_layout():
    # copy i of the (lpad, rpad)-padded sequence must appear at capsule
    # block i (reference concat order: sequence_router_naive.py:150-151)
    B, T, n, d = 1, 4, 2, 3
    u = np.arange(B * T * n * d, dtype=np.float32).reshape(B, T, n, d)
    got = np.asarray(window_stack(jnp.asarray(u), 1, 1))
    assert got.shape == (B, T, 3 * n, d)
    padded = np.pad(u, ((0, 0), (1, 1), (0, 0), (0, 0)))
    for i in range(3):
        np.testing.assert_array_equal(got[:, :, i * n : (i + 1) * n], padded[:, i : i + T])


def test_pad_capsule_never_routed():
    u, W, b = _rand_problem(4)
    v = np.asarray(
        route_layer(jnp.asarray(u), jnp.asarray(W), jnp.asarray(b), 1, False, True)
    )
    # coupling to capsule 0 is softmax(-1e9-ish) ~ 0 -> s_0 ~ 0 -> ||v_0|| tiny
    norms = np.linalg.norm(v, axis=-1)
    assert norms[..., 0].max() < 1e-6
    assert norms[..., 1:].mean() > 1e-3
