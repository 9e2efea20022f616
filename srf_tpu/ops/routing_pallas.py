"""Pallas TPU kernel: fused sequence-wise dynamic routing (SDR).

The SDR time recurrence is the throughput bottleneck of the SRF model
(SURVEY.md §3.2: the reference runs it as a tf.while_loop + TensorArray,
sequence_router_lowmemory.py:172-177). The XLA version here is a lax.scan
(ops/routing.py); this kernel fuses the whole recurrence for one capsule
layer into a single Pallas program:

- the transformation weights live in VMEM for the entire sequence,
- per timestep: prediction matmul (MXU), agreement with v_{t-1}, softmax
  over output capsules, weighted sum, squash — all fused, no HBM round
  trips between timesteps,
- grid over batch tiles; the time loop is a fori_loop inside the kernel.

Gradients: the op carries a custom VJP whose backward re-runs the XLA scan
implementation's VJP (numerically identical math). The fused kernel is the
inference/decode fast path; training may use it too at the cost of one
extra XLA forward in the backward pass.

Falls back to interpret mode automatically off-TPU (tests run on CPU).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srf_tpu.ops.routing import NEG_INF, sequential_routing
from srf_tpu.ops.squash import squash


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except (IndexError, RuntimeError):
        return False


def _sdr_kernel(u_ref, w_ref, b_ref, out_ref, *, num_iter, mask_pad, out_n,
                out_d):
    """One batch tile: u [Bt, T, in_n, in_d] -> vs [Bt, T, out_n, out_d]."""
    bt, seq_len, in_n, in_d = u_ref.shape
    w = w_ref[:]          # [in_n, in_d, out_n*out_d]
    bias = b_ref[:]       # [in_n, out_n*out_d]

    if mask_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, out_n), 1)
        pad_mask = jnp.where(col == 0, NEG_INF, 0.0).astype(jnp.float32)
    else:
        pad_mask = None

    def step(t, v_prev):
        u_t = u_ref[:, t]  # [Bt, in_n, in_d]
        # prediction vectors: per-input-capsule matmul on the MXU
        u_hat = jax.lax.dot_general(
            jnp.transpose(u_t, (1, 0, 2)),  # [in_n, Bt, in_d]
            w,                              # [in_n, in_d, out_no]
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [in_n, Bt, out_no]
        u_hat = u_hat + bias[:, None, :]
        u_hat = u_hat.reshape(in_n, bt, out_n, out_d)

        v = v_prev
        b = jnp.zeros((in_n, bt, out_n), jnp.float32)
        for _ in range(num_iter):
            # agreement with previous output capsules
            b = b + jnp.sum(u_hat * v[None], axis=-1)
            if pad_mask is not None:
                b = b + pad_mask[None]
            c = jax.nn.softmax(b, axis=-1)
            s = jnp.sum(c[..., None] * u_hat, axis=0)  # [Bt, out_n, out_d]
            v = squash(s, axis=-1)
        out_ref[:, t] = v
        return v

    v0 = jnp.zeros((bt, out_n, out_d), jnp.float32)
    jax.lax.fori_loop(0, seq_len, step, v0)


def _pallas_sdr(u, wgt, bias, num_iter, mask_pad_capsule, batch_tile=None,
                interpret=None):
    batch, seq_len, in_n, in_d = u.shape
    _, out_n, out_d, _ = wgt.shape
    if interpret is None:
        interpret = not _on_tpu()
    if batch_tile is None or batch_tile > batch:
        batch_tile = batch
    while batch % batch_tile:
        batch_tile -= 1

    w_flat = jnp.transpose(wgt, (0, 3, 1, 2)).reshape(in_n, in_d, out_n * out_d)
    b_flat = bias.reshape(in_n, out_n * out_d)

    kernel = functools.partial(
        _sdr_kernel, num_iter=num_iter, mask_pad=mask_pad_capsule,
        out_n=out_n, out_d=out_d,
    )
    grid = (batch // batch_tile,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, seq_len, in_n, in_d),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.ANY if False else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (in_n, in_d, out_n * out_d), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (in_n, out_n * out_d), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, seq_len, out_n, out_d),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, seq_len, out_n, out_d),
                                       jnp.float32),
        interpret=interpret,
    )(u.astype(jnp.float32), w_flat, b_flat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sequential_routing_pallas(u, wgt, bias, num_iter, mask_pad_capsule,
                              batch_tile=None):
    """Fused-SDR with XLA-scan VJP. Same contract as
    ops.routing.sequential_routing."""
    return _pallas_sdr(u, wgt, bias, num_iter, mask_pad_capsule, batch_tile)


def _fwd(u, wgt, bias, num_iter, mask_pad_capsule, batch_tile):
    out = _pallas_sdr(u, wgt, bias, num_iter, mask_pad_capsule, batch_tile)
    return out, (u, wgt, bias)


def _bwd(num_iter, mask_pad_capsule, batch_tile, residuals, g):
    u, wgt, bias = residuals
    _, vjp = jax.vjp(
        lambda u_, w_, b_: sequential_routing(
            u_, w_, b_, num_iter, mask_pad_capsule
        ),
        u, wgt, bias,
    )
    return vjp(g)


sequential_routing_pallas.defvjp(_fwd, _bwd)
