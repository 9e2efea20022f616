"""Pallas TPU kernel: fused sequence-wise dynamic routing (SDR).

The SDR time recurrence is the throughput bottleneck of the SRF model
(SURVEY.md §3.2: the reference runs it as a tf.while_loop + TensorArray,
sequence_router_lowmemory.py:172-177). This kernel runs the recurrence for
one capsule layer as a Pallas program with grid (batch, time): time is the
innermost (sequential) grid dimension, the carried output capsules live in
a VMEM scratch that persists across grid steps (reset at t == 0), and each
step's prediction/agreement/softmax/weighted-sum/squash chain is fused —
weights stay resident in VMEM, no HBM round trips between timesteps.

Mosaic-friendly layout (everything 2-D, lanes = out_n*out_d = "out_no"):
    u_t     [in_n, in_d]       block per (b, t); in_d statically unrolled
    u_hat   [in_n, out_no]     rank-1 accumulated prediction vectors
    G       [out_no, out_n]    static 0/1 capsule-group matrix
    agreement  b += (u_hat * v_row) @ G        -> [in_n, out_n]   (MXU)
    coupling   c = softmax(b, lanes)
    s = sum_n(u_hat * (c @ G^T))               -> [1, out_no]
    squash via group norms: (s*s) @ G, factor spread back with G^T

Gradients: custom VJP whose backward re-runs the XLA scan implementation's
VJP (numerically identical math). Falls back to interpret mode off-TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srf_tpu.ops.routing import NEG_INF, sequential_routing


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except (IndexError, RuntimeError):
        return False


def _sdr_kernel(u_ref, w_ref, b_ref, g_ref, gt_ref, out_ref, *,
                num_iter, mask_pad, in_d, out_n, out_no):
    """Grid (batch,): u [1, T, in_n, in_d] -> out [1, T, out_no]."""
    seq_len = u_ref.shape[1]
    in_n = u_ref.shape[2]
    g = g_ref[:]    # [out_no, out_n]
    gt = gt_ref[:]  # [out_n, out_no]
    bias = b_ref[:]  # [in_n, out_no]

    if mask_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, out_n), 1)
        pad_mask = jnp.where(col == 0, NEG_INF, 0.0).astype(jnp.float32)

    def step(t, v_carry):
        u_t = u_ref[0, t]  # [in_n, in_d]
        u_hat = bias
        for j in range(in_d):  # in_d is small (8-20): static unroll (VPU)
            u_hat = u_hat + u_t[:, j][:, None] * w_ref[j]

        v = v_carry  # [1, out_no]
        b_acc = jnp.zeros((in_n, out_n), jnp.float32)
        for _ in range(num_iter):
            b_acc = b_acc + jnp.dot(u_hat * v, g,
                                    preferred_element_type=jnp.float32)
            if mask_pad:
                b_acc = b_acc + pad_mask
            c = jax.nn.softmax(b_acc, axis=1)  # [in_n, out_n]
            c_exp = jnp.dot(c, gt, preferred_element_type=jnp.float32)
            s = jnp.sum(u_hat * c_exp, axis=0, keepdims=True)  # [1, out_no]
            sq = jnp.dot(s * s, g, preferred_element_type=jnp.float32)
            factor = (sq / (1.0 + sq)) / jnp.sqrt(sq + 1e-7)
            v = s * jnp.dot(factor, gt, preferred_element_type=jnp.float32)
        out_ref[0, pl.ds(t, 1)] = v
        return v

    v0 = jnp.zeros((1, out_no), jnp.float32)
    jax.lax.fori_loop(0, seq_len, step, v0)


def _pallas_sdr(u, wgt, bias, num_iter, mask_pad_capsule, interpret=None):
    batch, seq_len, in_n, in_d = u.shape
    _, out_n, out_d, _ = wgt.shape
    out_no = out_n * out_d
    if interpret is None:
        interpret = not _on_tpu()

    # [in_d, in_n, out_no] so the unrolled j-loop indexes the leading dim
    w_flat = jnp.transpose(wgt, (3, 0, 1, 2)).reshape(in_d, in_n, out_no)
    b_flat = bias.reshape(in_n, out_no)
    group = np.zeros((out_no, out_n), np.float32)
    group[np.arange(out_no), np.arange(out_no) // out_d] = 1.0
    g = jnp.asarray(group)

    kernel = functools.partial(
        _sdr_kernel, num_iter=num_iter, mask_pad=mask_pad_capsule,
        in_d=in_d, out_n=out_n, out_no=out_no,
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, seq_len, in_n, in_d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_d, in_n, out_no), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_n, out_no), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_no, out_n), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_n, out_no), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, seq_len, out_no), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, seq_len, out_no), jnp.float32),
        interpret=interpret,
    )(u.astype(jnp.float32), w_flat, b_flat, g, jnp.transpose(g))
    return out.reshape(batch, seq_len, out_n, out_d)


def _sdr_bwd_kernel(u_ref, vs_ref, dvs_ref, w_ref, b_ref, g_ref, gt_ref,
                    du_ref, dw_ref, db_ref, *, mask_pad, in_d, out_n, out_no):
    """Reverse pass for num_iter == 1, grid (batch,).

    Recomputes the per-step forward chain from ``u`` and the saved forward
    outputs ``vs`` (v_{t-1} is vs[t-1]), walks time backwards carrying the
    gradient flowing into v_{t-1} from the agreement term, and accumulates
    dW/dbias across the batch grid (initialized at b == 0).
    """
    b_idx = pl.program_id(0)
    seq_len = u_ref.shape[1]
    in_n = u_ref.shape[2]
    g = g_ref[:]
    gt = gt_ref[:]
    bias = b_ref[:]

    @pl.when(b_idx == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    if mask_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, out_n), 1)
        pad_mask = jnp.where(col == 0, NEG_INF, 0.0).astype(jnp.float32)

    def step(k, dv_next):
        t = seq_len - 1 - k
        u_t = u_ref[0, t]  # [in_n, in_d]
        # v_{t-1}: forward output at t-1, zeros at t == 0
        v_prev = jnp.where(t > 0, vs_ref[0, pl.ds(jnp.maximum(t - 1, 0), 1)],
                           jnp.zeros((1, out_no), jnp.float32))
        # ---- recompute the forward chain ----
        u_hat = bias
        for j in range(in_d):
            u_hat = u_hat + u_t[:, j][:, None] * w_ref[j]
        a = jnp.dot(u_hat * v_prev, g, preferred_element_type=jnp.float32)
        if mask_pad:
            a = a + pad_mask
        c = jax.nn.softmax(a, axis=1)
        ce = jnp.dot(c, gt, preferred_element_type=jnp.float32)
        s = jnp.sum(u_hat * ce, axis=0, keepdims=True)
        q = jnp.dot(s * s, g, preferred_element_type=jnp.float32)
        inv_sqrt = 1.0 / jnp.sqrt(q + 1e-7)
        f = (q / (1.0 + q)) * inv_sqrt
        fe = jnp.dot(f, gt, preferred_element_type=jnp.float32)

        # ---- backward ----
        dv = dvs_ref[0, pl.ds(t, 1)] + dv_next  # [1, out_no]
        # v = s * fe
        ds = dv * fe
        df = jnp.dot(dv * s, g, preferred_element_type=jnp.float32)  # [1,out_n]
        # f(q) = q/(1+q) * (q+eps)^-1/2
        dfdq = inv_sqrt / ((1.0 + q) * (1.0 + q)) - 0.5 * (
            q / (1.0 + q)
        ) * inv_sqrt / (q + 1e-7)
        dq = df * dfdq
        ds = ds + 2.0 * s * jnp.dot(dq, gt, preferred_element_type=jnp.float32)
        # s = sum_n(u_hat * ce)
        du_hat = ce * ds
        dce = u_hat * ds
        dc = jnp.dot(dce, g, preferred_element_type=jnp.float32)
        # softmax backward over lanes
        da = c * (dc - jnp.sum(dc * c, axis=1, keepdims=True))
        dag = jnp.dot(da, gt, preferred_element_type=jnp.float32)
        # a = (u_hat * v_prev) @ G
        du_hat = du_hat + dag * v_prev
        dv_prev = jnp.sum(dag * u_hat, axis=0, keepdims=True)
        # u_hat = bias + sum_j u_t[:, j] x W2[j]
        db_ref[:] += du_hat
        du_cols = []
        for j in range(in_d):
            dw_ref[j] += du_hat * u_t[:, j][:, None]
            du_cols.append(jnp.sum(du_hat * w_ref[j], axis=1, keepdims=True))
        du_ref[0, pl.ds(t, 1)] = jnp.concatenate(du_cols, axis=1)[None]
        return dv_prev

    dv0 = jnp.zeros((1, out_no), jnp.float32)
    jax.lax.fori_loop(0, seq_len, step, dv0)


def _pallas_sdr_bwd(u, wgt, bias, vs, dvs, mask_pad_capsule, interpret=None):
    batch, seq_len, in_n, in_d = u.shape
    _, out_n, out_d, _ = wgt.shape
    out_no = out_n * out_d
    if interpret is None:
        interpret = not _on_tpu()

    w_flat = jnp.transpose(wgt, (3, 0, 1, 2)).reshape(in_d, in_n, out_no)
    b_flat = bias.reshape(in_n, out_no)
    group = np.zeros((out_no, out_n), np.float32)
    group[np.arange(out_no), np.arange(out_no) // out_d] = 1.0
    g = jnp.asarray(group)

    kernel = functools.partial(
        _sdr_bwd_kernel, mask_pad=mask_pad_capsule, in_d=in_d, out_n=out_n,
        out_no=out_no,
    )
    du, dw, db = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, seq_len, in_n, in_d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq_len, out_no), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq_len, out_no), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_d, in_n, out_no), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_n, out_no), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_no, out_n), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_n, out_no), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, seq_len, in_n, in_d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_d, in_n, out_no), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_n, out_no), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, seq_len, in_n, in_d), jnp.float32),
            jax.ShapeDtypeStruct((in_d, in_n, out_no), jnp.float32),
            jax.ShapeDtypeStruct((in_n, out_no), jnp.float32),
        ),
        interpret=interpret,
    )(
        u.astype(jnp.float32),
        vs.reshape(batch, seq_len, out_no).astype(jnp.float32),
        dvs.reshape(batch, seq_len, out_no).astype(jnp.float32),
        w_flat, b_flat, g, jnp.transpose(g),
    )
    dwgt = jnp.transpose(
        dw.reshape(in_d, in_n, out_n, out_d), (1, 2, 3, 0)
    )
    return du, dwgt, db.reshape(in_n, out_n, out_d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sequential_routing_pallas(u, wgt, bias, num_iter, mask_pad_capsule,
                              batch_tile=None):
    """Fused-SDR with fused VJP (num_iter == 1) or XLA-scan VJP fallback.
    Same contract as ops.routing.sequential_routing (``batch_tile`` kept for
    API stability)."""
    return _pallas_sdr(u, wgt, bias, num_iter, mask_pad_capsule)


def _fwd(u, wgt, bias, num_iter, mask_pad_capsule, batch_tile):
    out = _pallas_sdr(u, wgt, bias, num_iter, mask_pad_capsule)
    return out, (u, wgt, bias, out)


def _bwd(num_iter, mask_pad_capsule, batch_tile, residuals, g):
    u, wgt, bias, vs = residuals
    if num_iter == 1:
        du, dwgt, dbias = _pallas_sdr_bwd(u, wgt, bias, vs, g,
                                          mask_pad_capsule)
        return du.astype(u.dtype), dwgt, dbias
    _, vjp = jax.vjp(
        lambda u_, w_, b_: sequential_routing(
            u_, w_, b_, num_iter, mask_pad_capsule
        ),
        u, wgt, bias,
    )
    return vjp(g.astype(u.dtype))


sequential_routing_pallas.defvjp(_fwd, _bwd)
