"""Pallas TPU kernel: fused sequence-wise dynamic routing (SDR).

The SDR time recurrence is the throughput bottleneck of the SRF model
(SURVEY.md §3.2: the reference runs it as a tf.while_loop + TensorArray,
sequence_router_lowmemory.py:172-177). Measured on v5e, the XLA ``lax.scan``
formulation is latency-bound: ~13 of ~19 µs/step are fixed per-step costs
(thunk dispatch, relayouts, carry DMA), not compute — see BENCH_NOTES.md.

This kernel (v5) removes that overhead: ONE grid step per timestep
(grid = (T,)) processes the ENTIRE batch, with the per-utterance routing
chain statically unrolled in-kernel over batch rows. Block DMA is
double-buffered by the BlockSpec machinery; the carried output capsules
live in a VMEM scratch [B_pad, out_no] that persists across grid steps
(reset at t == 0). An earlier version (v4, in git history) used grid
(batch, time) — 1769 tiny invocations; the per-invocation latency ate the
fusion win.

Mosaic-friendly layout (everything 2-D, lanes = out_n*out_d = "out_no"):
    u       [T, B_pad*in_n, in_d]  batch-major rows; in_d statically
                                   unrolled on the VPU
    u_hat   [in_n, out_no]         per-row prediction vectors
    G       [out_no, out_n]        static 0/1 capsule-group matrix
    agreement  b += (u_hat * v_row) @ G        -> [in_n, out_n]   (MXU)
    coupling   c = softmax(b, lanes)
    s = sum_n(u_hat * (c @ G^T))               -> [1, out_no]
    squash via group norms: (s*s) @ G, factor spread back with G^T

Backward: a fused reverse-time kernel for num_iter == 1 (the canonical SRF
configs) that recomputes the cheap per-step chain from ``u`` and the saved
forward outputs and accumulates dW/dbias across the whole grid; other
iteration counts fall back to the XLA scan's VJP.
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


def _group_matrix(out_n, out_d):
    out_no = out_n * out_d
    group = np.zeros((out_no, out_n), np.float32)
    group[np.arange(out_no), np.arange(out_no) // out_d] = 1.0
    return jnp.asarray(group)


def _routing_iters(u_hat, v, g, gt, pad_mask, num_iter, in_n, out_n):
    """Shared fwd math: returns final v [1, out_no]."""
    b_acc = jnp.zeros((in_n, out_n), jnp.float32)
    for _ in range(num_iter):
        b_acc = b_acc + jnp.dot(u_hat * v, g,
                                preferred_element_type=jnp.float32)
        if pad_mask is not None:
            b_acc = b_acc + pad_mask
        c = jax.nn.softmax(b_acc, axis=1)
        c_exp = jnp.dot(c, gt, preferred_element_type=jnp.float32)
        s = jnp.sum(u_hat * c_exp, axis=0, keepdims=True)
        sq = jnp.dot(s * s, g, preferred_element_type=jnp.float32)
        factor = (sq / (1.0 + sq)) / jnp.sqrt(sq + 1e-7)
        v = s * jnp.dot(factor, gt, preferred_element_type=jnp.float32)
    return v


def _pad_mask_row(out_n):
    col = jax.lax.broadcasted_iota(jnp.int32, (1, out_n), 1)
    return jnp.where(col == 0, NEG_INF, 0.0).astype(jnp.float32)


def _sdr_fwd_kernel(u_ref, w_ref, b_ref, g_ref, gt_ref, out_ref, v_ref, *,
                    num_iter, mask_pad, in_d, in_n, out_n, out_no, batch):
    """Grid (T,): u [1, B*in_n, in_d] -> out [1, B_pad, out_no]."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        v_ref[:] = jnp.zeros_like(v_ref)

    pad_mask = _pad_mask_row(out_n) if mask_pad else None
    g = g_ref[:]
    gt = gt_ref[:]
    bias = b_ref[:]
    for b in range(batch):  # static unroll: independent per-row chains
        u_b = u_ref[0, b * in_n:(b + 1) * in_n, :]  # [in_n, in_d]
        u_hat = bias
        for j in range(in_d):  # in_d is small (8-20): unroll on the VPU
            u_hat = u_hat + u_b[:, j][:, None] * w_ref[j]
        v = _routing_iters(u_hat, v_ref[b:b + 1, :], g, gt, pad_mask,
                           num_iter, in_n, out_n)
        v_ref[b:b + 1, :] = v
        out_ref[0, b:b + 1, :] = v


def _prep_inputs(u, wgt, bias):
    """u [B,T,in_n,in_d] -> [T, B_pad*in_n, in_d] batch-major rows; flat W."""
    batch, seq_len, in_n, in_d = u.shape
    b_pad = -batch % 8
    u_rows = jnp.moveaxis(u.astype(jnp.float32), 1, 0)
    if b_pad:
        u_rows = jnp.pad(u_rows, ((0, 0), (0, b_pad), (0, 0), (0, 0)))
    u_rows = u_rows.reshape(seq_len, (batch + b_pad) * in_n, in_d)
    w_flat = jnp.transpose(wgt, (3, 0, 1, 2)).reshape(
        in_d, in_n, wgt.shape[1] * wgt.shape[2]
    )
    b_flat = bias.reshape(in_n, -1)
    return u_rows, w_flat, b_flat, batch + b_pad


def _pallas_sdr(u, wgt, bias, num_iter, mask_pad_capsule, interpret=None):
    batch, seq_len, in_n, in_d = u.shape
    _, out_n, out_d, _ = wgt.shape
    out_no = out_n * out_d
    if interpret is None:
        interpret = not _on_tpu()

    u_rows, w_flat, b_flat, b_pad = _prep_inputs(u, wgt, bias)
    g = _group_matrix(out_n, out_d)

    kernel = functools.partial(
        _sdr_fwd_kernel, num_iter=num_iter, mask_pad=mask_pad_capsule,
        in_d=in_d, in_n=in_n, out_n=out_n, out_no=out_no, batch=b_pad,
    )
    out = pl.pallas_call(
        kernel,
        grid=(seq_len,),
        in_specs=[
            pl.BlockSpec((1, b_pad * in_n, in_d), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_d, in_n, out_no), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_n, out_no), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_no, out_n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_n, out_no), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_pad, out_no), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((seq_len, b_pad, out_no), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, out_no), jnp.float32)],
        interpret=interpret,
    )(u_rows, w_flat, b_flat, g, jnp.transpose(g))
    out = jnp.moveaxis(out[:, :batch], 0, 1)
    return out.reshape(batch, seq_len, out_n, out_d)


def _sdr_bwd_kernel(u_ref, vprev_ref, dvs_ref, w_ref, b_ref, g_ref, gt_ref,
                    du_ref, dw_ref, db_ref, dv_ref, *, mask_pad, in_d, in_n,
                    out_n, out_no, seq_len, batch):
    """Grid (k,) with k walking time BACKWARDS via the index maps.

    Recomputes the per-step forward chain (num_iter == 1) and accumulates
    dW/dbias across the whole grid; the carried gradient into v_{t-1} lives
    in VMEM scratch, reset at k == 0 (i.e. t == T-1).
    """
    k = pl.program_id(0)
    g = g_ref[:]
    gt = gt_ref[:]

    @pl.when(k == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    t_is_zero = k == seq_len - 1
    pad_mask = _pad_mask_row(out_n) if mask_pad else None
    for b in range(batch):
        u_b = u_ref[0, b * in_n:(b + 1) * in_n, :]  # [in_n, in_d]
        v_prev = jnp.where(
            t_is_zero, jnp.zeros((1, out_no), jnp.float32),
            vprev_ref[0, b:b + 1, :],
        )

        # ---- recompute the forward chain ----
        u_hat = b_ref[:]
        for j in range(in_d):
            u_hat = u_hat + u_b[:, j][:, None] * w_ref[j]
        a = jnp.dot(u_hat * v_prev, g, preferred_element_type=jnp.float32)
        if pad_mask is not None:
            a = a + pad_mask
        c = jax.nn.softmax(a, axis=1)
        ce = jnp.dot(c, gt, preferred_element_type=jnp.float32)
        s = jnp.sum(u_hat * ce, axis=0, keepdims=True)
        q = jnp.dot(s * s, g, preferred_element_type=jnp.float32)
        inv_sqrt = 1.0 / jnp.sqrt(q + 1e-7)
        f = (q / (1.0 + q)) * inv_sqrt
        fe = jnp.dot(f, gt, preferred_element_type=jnp.float32)

        # ---- backward ----
        dv = dvs_ref[0, b:b + 1, :] + dv_ref[b:b + 1, :]  # [1, out_no]
        ds = dv * fe
        df = jnp.dot(dv * s, g, preferred_element_type=jnp.float32)
        dfdq = inv_sqrt / ((1.0 + q) * (1.0 + q)) - 0.5 * (q / (1.0 + q)) * (
            inv_sqrt / (q + 1e-7)
        )
        dq = df * dfdq
        ds = ds + 2.0 * s * jnp.dot(dq, gt,
                                    preferred_element_type=jnp.float32)
        du_hat = ce * ds
        dce = u_hat * ds
        dc = jnp.dot(dce, g, preferred_element_type=jnp.float32)
        da = c * (dc - jnp.sum(dc * c, axis=1, keepdims=True))
        dag = jnp.dot(da, gt, preferred_element_type=jnp.float32)
        du_hat = du_hat + dag * v_prev
        dv_prev = jnp.sum(dag * u_hat, axis=0, keepdims=True)

        db_ref[:] += du_hat
        du_cols = []
        for j in range(in_d):
            dw_ref[j] += du_hat * u_b[:, j][:, None]
            du_cols.append(jnp.sum(du_hat * w_ref[j], axis=1, keepdims=True))
        du_ref[0, b * in_n:(b + 1) * in_n, :] = jnp.concatenate(du_cols,
                                                                axis=1)
        dv_ref[b:b + 1, :] = dv_prev


def _pallas_sdr_bwd(u, wgt, bias, vs, dvs, mask_pad_capsule, interpret=None):
    batch, seq_len, in_n, in_d = u.shape
    _, out_n, out_d, _ = wgt.shape
    out_no = out_n * out_d
    if interpret is None:
        interpret = not _on_tpu()

    u_rows, w_flat, b_flat, b_pad = _prep_inputs(u, wgt, bias)
    g = _group_matrix(out_n, out_d)
    # [T, B_pad, out_no] lane-grouped forward outputs / cotangents; vs is
    # indexed at t-1 via the block index map (value for t==0 overridden
    # in-kernel)
    def _rows(x):
        x = jnp.moveaxis(x.reshape(batch, seq_len, out_no), 1, 0)
        if b_pad != batch:
            x = jnp.pad(x, ((0, 0), (0, b_pad - batch), (0, 0)))
        return x

    vs_rows = _rows(vs)
    dvs_rows = _rows(dvs)

    kernel = functools.partial(
        _sdr_bwd_kernel, mask_pad=mask_pad_capsule, in_d=in_d, in_n=in_n,
        out_n=out_n, out_no=out_no, seq_len=seq_len, batch=b_pad,
    )
    du, dw, db = pl.pallas_call(
        kernel,
        grid=(seq_len,),
        in_specs=[
            # t = T-1-k
            pl.BlockSpec((1, b_pad * in_n, in_d),
                         lambda k: (seq_len - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM),
            # v_{t-1} = vs[t-1]; clamped at t==0 (overridden in-kernel)
            pl.BlockSpec(
                (1, b_pad, out_no),
                lambda k: (jnp.maximum(seq_len - 2 - k, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, b_pad, out_no),
                         lambda k: (seq_len - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_d, in_n, out_no), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_n, out_no), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_no, out_n), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_n, out_no), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b_pad * in_n, in_d),
                         lambda k: (seq_len - 1 - k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_d, in_n, out_no), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_n, out_no), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((seq_len, b_pad * in_n, in_d), jnp.float32),
            jax.ShapeDtypeStruct((in_d, in_n, out_no), jnp.float32),
            jax.ShapeDtypeStruct((in_n, out_no), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((b_pad, out_no), jnp.float32)],
        interpret=interpret,
    )(u_rows, vs_rows, dvs_rows, w_flat, b_flat, g, jnp.transpose(g))
    du = jnp.moveaxis(du.reshape(seq_len, b_pad, in_n, in_d), 0, 1)[:batch]
    dwgt = jnp.transpose(dw.reshape(in_d, in_n, out_n, out_d), (1, 2, 3, 0))
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
        du, dwgt, dbias = _pallas_sdr_bwd(
            u, wgt, bias,
            vs.reshape(vs.shape[0], vs.shape[1], -1),
            g.reshape(g.shape[0], g.shape[1], -1),
            mask_pad_capsule,
        )
        return du.astype(u.dtype), dwgt, dbias
    _, vjp = jax.vjp(
        lambda u_, w_, b_: sequential_routing(
            u_, w_, b_, num_iter, mask_pad_capsule
        ),
        u, wgt, bias,
    )
    return vjp(g.astype(u.dtype))


sequential_routing_pallas.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# v6: whole-scan kernel, batch-vectorized (grid step = G timesteps)
# --------------------------------------------------------------------------
#
# v5 (above) removed the XLA scan's per-step overhead but statically
# unrolled the batch rows in-kernel — the ~30x larger body lost the win
# (12.4 vs 8.24 ms fwd, BENCH_NOTES r2). v6 keeps the whole batch as 2-D
# tiles instead:
#
#   u_hat [B, in_n, out_no]   per-j VPU broadcast-FMA (in_d unrolled)
#   logits = reshape(u_hat * v, [B*in_n, out_no]) @ G     (one MXU matmul)
#   c      = softmax over out_n lanes
#   spread = reshape(c, [B*in_n, out_n]) @ G^T            (one MXU matmul)
#   s      = sum_n(u_hat * spread)        (sublane reduction)
#   squash via group norms, as v5
#
# and amortizes grid overhead further by processing TIME_BLOCK timesteps
# per grid step with an in-kernel fori_loop (the carry v stays in VMEM
# scratch across grid steps). The sequential dependence is unchanged —
# this is the same math as ops.routing._sdr_step, latency-optimized.


def _v6_step(u3, v_row, w_ref, bias, g, gt, pad_mask, num_iter,
             in_d, in_n, out_n, out_no, batch):
    """One SDR timestep, batch-vectorized. u3 [B, in_n, in_d];
    v_row [B, out_no]. Returns new v [B, out_no]."""
    u_hat = jnp.broadcast_to(bias[None], (batch, in_n, out_no))
    for j in range(in_d):
        u_hat = u_hat + u3[:, :, j][:, :, None] * w_ref[j][None]
    b_acc = jnp.zeros((batch, in_n, out_n), jnp.float32)
    v = v_row
    for _ in range(num_iter):
        # 3-D x 2-D dots contract the lane dim directly — merging (B,
        # in_n) into rows would need a relayout (in_n is not a multiple
        # of the 8-row sublane tile)
        hv = u_hat * v[:, None, :]
        b_acc = b_acc + jnp.dot(hv, g, preferred_element_type=jnp.float32)
        if pad_mask is not None:
            b_acc = b_acc + pad_mask[None]
        c = jax.nn.softmax(b_acc, axis=2)
        ce = jnp.dot(c, gt, preferred_element_type=jnp.float32)
        s = jnp.sum(u_hat * ce, axis=1)  # [B, out_no]
        q = jnp.dot(s * s, g, preferred_element_type=jnp.float32)
        factor = (q / (1.0 + q)) / jnp.sqrt(q + 1e-7)
        v = s * jnp.dot(factor, gt, preferred_element_type=jnp.float32)
    return v


def _sdr_v6_fwd_kernel(u_ref, w_ref, b_ref, g_ref, gt_ref, out_ref, v_ref,
                       *, num_iter, mask_pad, in_d, in_n, out_n, out_no,
                       batch, time_block):
    """Grid (T/G,): u [G, B, in_n, in_d] -> out [G, B, out_no]."""
    tb = pl.program_id(0)

    @pl.when(tb == 0)
    def _():
        v_ref[:] = jnp.zeros_like(v_ref)

    pad_mask = _pad_mask_row(out_n) if mask_pad else None
    g = g_ref[:]
    gt = gt_ref[:]
    bias = b_ref[:]

    def body(i, v_row):
        v = _v6_step(u_ref[i], v_row, w_ref, bias, g, gt, pad_mask,
                     num_iter, in_d, in_n, out_n, out_no, batch)
        out_ref[i] = v
        return v

    v_ref[:] = jax.lax.fori_loop(0, time_block, body, v_ref[:])


def _prep_v6(u, wgt, bias, time_block):
    """u [B,T,in_n,in_d] -> [T_pad, B_pad, in_n, in_d] time-major."""
    batch, seq_len, in_n, in_d = u.shape
    b_pad = -batch % 8
    t_pad = -seq_len % time_block
    u_t = jnp.moveaxis(u.astype(jnp.float32), 1, 0)
    if b_pad or t_pad:
        u_t = jnp.pad(u_t, ((0, t_pad), (0, b_pad), (0, 0), (0, 0)))
    w_flat = jnp.transpose(wgt, (3, 0, 1, 2)).reshape(
        in_d, in_n, wgt.shape[1] * wgt.shape[2]
    )
    return u_t, w_flat, bias.reshape(in_n, -1), batch + b_pad, seq_len + t_pad


def _pallas_sdr_v6(u, wgt, bias, num_iter, mask_pad_capsule, time_block=8,
                   interpret=None):
    batch, seq_len, in_n, in_d = u.shape
    _, out_n, out_d, _ = wgt.shape
    out_no = out_n * out_d
    if interpret is None:
        interpret = not _on_tpu()

    u_t, w_flat, b_flat, b_pad, t_pad_len = _prep_v6(u, wgt, bias, time_block)
    g = _group_matrix(out_n, out_d)

    kernel = functools.partial(
        _sdr_v6_fwd_kernel, num_iter=num_iter, mask_pad=mask_pad_capsule,
        in_d=in_d, in_n=in_n, out_n=out_n, out_no=out_no, batch=b_pad,
        time_block=time_block,
    )
    out = pl.pallas_call(
        kernel,
        grid=(t_pad_len // time_block,),
        in_specs=[
            pl.BlockSpec((time_block, b_pad, in_n, in_d),
                         lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((in_d, in_n, out_no), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_n, out_no), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_no, out_n), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_n, out_no), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((time_block, b_pad, out_no),
                               lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad_len, b_pad, out_no),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_pad, out_no), jnp.float32)],
        # the [G, B, in_n, in_d] u blocks pad in_d to 128 lanes in VMEM;
        # raise the conservative 16MB scoped limit (v5e has 128MB VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(u_t, w_flat, b_flat, g, jnp.transpose(g))
    out = jnp.moveaxis(out[:seq_len, :batch], 0, 1)
    return out.reshape(batch, seq_len, out_n, out_d)


def _sdr_v6_bwd_kernel(u_ref, vprev_ref, dvs_ref, w_ref, b_ref, g_ref,
                       gt_ref, du_ref, dw_ref, db_ref, dv_ref, *, mask_pad,
                       in_d, in_n, out_n, out_no, batch, time_block):
    """Reverse-time grid; recomputes the forward chain (num_iter == 1) and
    accumulates dW/dbias in the constant-indexed output blocks. The carried
    gradient into v_{t-1} lives in VMEM scratch. ``vprev_ref`` supplies
    v_{t-1} pre-shifted (vs rolled by one with a zero first row)."""
    k = pl.program_id(0)
    g = g_ref[:]
    gt = gt_ref[:]
    bias = b_ref[:]

    @pl.when(k == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    pad_mask = _pad_mask_row(out_n) if mask_pad else None

    def body(step, carry):
        dv_carry, dw_acc, db_acc = carry
        i = time_block - 1 - step
        u3 = u_ref[i]                       # [B, in_n, in_d]
        v_prev = vprev_ref[i]               # [B, out_no]

        # ---- recompute the forward chain ----
        u_hat = jnp.broadcast_to(bias[None], (batch, in_n, out_no))
        for j in range(in_d):
            u_hat = u_hat + u3[:, :, j][:, :, None] * w_ref[j][None]
        hv = u_hat * v_prev[:, None, :]
        a = jnp.dot(hv, g, preferred_element_type=jnp.float32)
        if pad_mask is not None:
            a = a + pad_mask[None]
        c = jax.nn.softmax(a, axis=2)
        ce = jnp.dot(c, gt, preferred_element_type=jnp.float32)
        s = jnp.sum(u_hat * ce, axis=1)     # [B, out_no]
        q = jnp.dot(s * s, g, preferred_element_type=jnp.float32)
        inv_sqrt = 1.0 / jnp.sqrt(q + 1e-7)
        f = (q / (1.0 + q)) * inv_sqrt
        fe = jnp.dot(f, gt, preferred_element_type=jnp.float32)

        # ---- backward ----
        dv = dvs_ref[i] + dv_carry          # [B, out_no]
        ds = dv * fe
        df = jnp.dot(dv * s, g, preferred_element_type=jnp.float32)
        dfdq = inv_sqrt / ((1.0 + q) * (1.0 + q)) - 0.5 * (
            q / (1.0 + q)) * (inv_sqrt / (q + 1e-7))
        dq = df * dfdq
        ds = ds + 2.0 * s * jnp.dot(dq, gt,
                                    preferred_element_type=jnp.float32)
        du_hat = ce * ds[:, None, :]
        dce = u_hat * ds[:, None, :]
        dc = jnp.dot(dce, g, preferred_element_type=jnp.float32)
        da = c * (dc - jnp.sum(dc * c, axis=2, keepdims=True))
        dag = jnp.dot(da, gt, preferred_element_type=jnp.float32)
        du_hat = du_hat + dag * v_prev[:, None, :]
        dv_prev = jnp.sum(dag * u_hat, axis=1)

        db_acc = db_acc + jnp.sum(du_hat, axis=0)
        du_cols = []
        for j in range(in_d):
            dw_acc = dw_acc.at[j].add(
                jnp.sum(du_hat * u3[:, :, j][:, :, None], axis=0))
            du_cols.append(jnp.sum(du_hat * w_ref[j][None], axis=2))
        du_ref[i] = jnp.stack(du_cols, axis=-1)
        return dv_prev, dw_acc, db_acc

    dv0 = dv_ref[:]
    dv_out, dw_out, db_out = jax.lax.fori_loop(
        0, time_block, body, (dv0, dw_ref[:], db_ref[:]))
    dv_ref[:] = dv_out
    dw_ref[:] = dw_out
    db_ref[:] = db_out


def _pallas_sdr_v6_bwd(u, wgt, bias, vs, dvs, mask_pad_capsule,
                       time_block=8, interpret=None):
    batch, seq_len, in_n, in_d = u.shape
    _, out_n, out_d, _ = wgt.shape
    out_no = out_n * out_d
    if interpret is None:
        interpret = not _on_tpu()

    u_t, w_flat, b_flat, b_pad, t_pad_len = _prep_v6(u, wgt, bias, time_block)
    g = _group_matrix(out_n, out_d)

    def _rows(x):
        x = jnp.moveaxis(x.reshape(batch, seq_len, out_no), 1, 0)
        pads = ((0, t_pad_len - seq_len), (0, b_pad - batch), (0, 0))
        return jnp.pad(x, pads) if any(p[1] for p in pads) else x

    vs_rows = _rows(vs)
    # v_{t-1}: roll by one with a zero first row (v0 = 0)
    vprev_rows = jnp.concatenate(
        [jnp.zeros_like(vs_rows[:1]), vs_rows[:-1]], axis=0)
    dvs_rows = _rows(dvs)
    n_blocks = t_pad_len // time_block

    kernel = functools.partial(
        _sdr_v6_bwd_kernel, mask_pad=mask_pad_capsule, in_d=in_d,
        in_n=in_n, out_n=out_n, out_no=out_no, batch=b_pad,
        time_block=time_block,
    )
    rev = lambda k: (n_blocks - 1 - k, 0, 0)  # noqa: E731
    rev4 = lambda k: (n_blocks - 1 - k, 0, 0, 0)  # noqa: E731
    du, dw, db = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((time_block, b_pad, in_n, in_d), rev4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block, b_pad, out_no), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_block, b_pad, out_no), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_d, in_n, out_no), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_n, out_no), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_no, out_n), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_n, out_no), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((time_block, b_pad, in_n, in_d), rev4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_d, in_n, out_no), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in_n, out_no), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad_len, b_pad, in_n, in_d),
                                 jnp.float32),
            jax.ShapeDtypeStruct((in_d, in_n, out_no), jnp.float32),
            jax.ShapeDtypeStruct((in_n, out_no), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((b_pad, out_no), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(u_t, vprev_rows, dvs_rows, w_flat, b_flat, g, jnp.transpose(g))
    du = jnp.moveaxis(du[:seq_len, :batch], 0, 1)
    dwgt = jnp.transpose(dw.reshape(in_d, in_n, out_n, out_d), (1, 2, 3, 0))
    return du, dwgt, db.reshape(in_n, out_n, out_d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sequential_routing_pallas_scan(u, wgt, bias, num_iter,
                                   mask_pad_capsule, time_block=8):
    """v6 fused SDR (batch-vectorized whole-scan kernel) with fused VJP for
    num_iter == 1; same contract as ops.routing.sequential_routing."""
    return _pallas_sdr_v6(u, wgt, bias, num_iter, mask_pad_capsule,
                          time_block=time_block)


def _v6_fwd(u, wgt, bias, num_iter, mask_pad_capsule, time_block):
    out = _pallas_sdr_v6(u, wgt, bias, num_iter, mask_pad_capsule,
                         time_block=time_block)
    return out, (u, wgt, bias, out)


def _v6_bwd(num_iter, mask_pad_capsule, time_block, residuals, g):
    u, wgt, bias, vs = residuals
    if num_iter == 1:
        du, dwgt, dbias = _pallas_sdr_v6_bwd(
            u, wgt, bias,
            vs.reshape(vs.shape[0], vs.shape[1], -1),
            g.reshape(g.shape[0], g.shape[1], -1),
            mask_pad_capsule, time_block=time_block,
        )
        return du.astype(u.dtype), dwgt, dbias
    _, vjp = jax.vjp(
        lambda u_, w_, b_: sequential_routing(
            u_, w_, b_, num_iter, mask_pad_capsule
        ),
        u, wgt, bias,
    )
    return vjp(g.astype(u.dtype))


sequential_routing_pallas_scan.defvjp(_v6_fwd, _v6_bwd)
