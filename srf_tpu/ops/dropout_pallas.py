"""Pallas TPU kernel: fused dropout with in-kernel hardware PRNG.

Dropout is pure HBM traffic, and the XLA lowering pays for it three ways
(measured in BENCH_NOTES.md "Dense-family MFU" — the 13 train-mode masks
account for a large slice of CNN-WSJ's step):

1. mask generation is a *software* threefry hash stream — VPU compute, not
   bandwidth, runs at ~25% of HBM peak on v5e for big masks;
2. the fwd apply is a separate read+write pass over the activation;
3. the residual for the backward pass (the mask, or the threefry bits to
   recompute it) is saved and re-read at grad time.

This kernel is the TPU-native formulation (reference analog: the plain
``tf.nn.dropout`` calls sprinkled through tfsr/model/*.py): the mask comes
from the per-core hardware PRNG (``pltpu.prng_random_bits``) generated
*inside* the apply pass — one read + one write, no mask materialization —
and the backward pass *regenerates* the identical mask from the same
(seed, block) pair instead of saving anything: the VJP residual is one
uint32 scalar. Determinism: the stream is a pure function of the folded-in
JAX PRNG key (callers derive ``seed`` from ``make_rng('dropout')``), so a
fixed ``--tpu-seed`` still gives bit-identical runs — the stream simply
differs from the XLA/threefry one, which is why the kernel is opt-in
(``--tpu-dropout-kernel=pallas``) and off the reference-parity default.

Layout: the activation is viewed flat as [rows, 1024] f32 (lane-aligned),
gridded in row blocks; each block seeds the PRNG with (seed, block_id) so
streams are independent and each block is self-contained for regeneration.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 1024
_BLOCK_ROWS = 512  # 512x1024 f32 = 2 MB in + 2 MB out per block


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except (IndexError, RuntimeError):
        return False


def _mask_kernel(seed_ref, x_ref, out_ref, *, threshold, scale):
    """out = x * scale where bits >= threshold else 0 (one pass)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    bits = pltpu.bitcast(
        pltpu.prng_random_bits(x_ref.shape), jnp.uint32
    )
    keep = bits >= jnp.uint32(threshold)
    out_ref[...] = jnp.where(keep, x_ref[...] * scale, 0.0)


def _apply(x2d, seed, rate, interpret):
    rows = x2d.shape[0]
    # drop probability as a uint32 threshold: bits < threshold are dropped
    threshold = min(int(round(rate * 2.0**32)), 2**32 - 1)
    scale = 1.0 / (1.0 - rate)
    block_rows = min(_BLOCK_ROWS, rows)
    grid = (pl.cdiv(rows, block_rows),)
    return pl.pallas_call(
        functools.partial(_mask_kernel, threshold=threshold, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=interpret,
    )(seed, x2d)


def _to_2d(x):
    """Flat lane-aligned [rows, 1024] view (padded) of an arbitrary x."""
    n = x.size
    rows = -(-n // _LANES)
    flat = x.reshape(-1)
    pad = rows * _LANES - n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), x.dtype)])
    return flat.reshape(rows, _LANES), n


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _pallas_dropout(x, seed, rate):
    out, _ = _pallas_dropout_fwd(x, seed, rate)
    return out


def _pallas_dropout_fwd(x, seed, rate):
    x2d, n = _to_2d(x)
    out = _apply(x2d, seed.reshape(1), rate, False)
    return out.reshape(-1)[:n].reshape(x.shape), (seed,)


def _pallas_dropout_bwd(rate, res, g):
    (seed,) = res
    # same seed, same block grid -> bit-identical mask on the cotangent
    g2d, n = _to_2d(g)
    dg = _apply(g2d, seed.reshape(1), rate, False)
    return dg.reshape(-1)[:n].reshape(g.shape), None


_pallas_dropout.defvjp(_pallas_dropout_fwd, _pallas_dropout_bwd)


def fused_dropout(x, seed, rate):
    """Dropout keyed by a uint32 scalar array ``seed``.

    Equivalent in distribution to ``x * bernoulli(1-rate) / (1-rate)``
    (element kept iff its uniform uint32 >= rate * 2^32). On TPU this is
    the one-pass Pallas kernel (mask never materialized; the backward
    pass regenerates it from ``seed``). On other backends it falls back
    to an XLA bernoulli with a key folded from ``seed`` — same contract,
    different random stream (the Mosaic interpreter's emulated PRNG is
    degenerate, so there is no faithful CPU emulation of the kernel's
    stream; the fallback keeps CPU runs of ``--tpu-dropout-kernel=pallas``
    configs working).
    """
    if rate <= 0.0:
        return x
    if _on_tpu():
        return _pallas_dropout(x, seed, rate)
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed.astype(jnp.uint32))
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
