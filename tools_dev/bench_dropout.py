"""Probe: XLA threefry dropout vs the Pallas hardware-PRNG fused dropout.

Shapes = the CNN-WSJ train-mode masks that dominate its regularization
traffic (BENCH_NOTES "Dense-family MFU": 13 masks at ~80M elements are a
large slice of the 478 ms step). Measures, per shape:

  - fwd: one dropout apply
  - grad: d/dx of sum(dropout(x) * g)  (exercises the mask residual path:
    XLA saves/recomputes threefry bits; the Pallas kernel regenerates from
    the 4-byte seed)

Run: JAX_PLATFORMS=axon python tools_dev/bench_dropout.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from srf_tpu.ops.dropout_pallas import fused_dropout

SHAPES = [
    (40, 150, 31, 430),   # CNN-WSJ post-conv activation (~80M)
    (40, 300, 41, 96),    # CNN-TIMIT-ish mid stack (~47M)
    (29, 61, 512),        # STF-TIMIT FFN (~0.9M; small-op regime)
]
RATE = 0.2


def timeit(fn, *args, n=30):
    jax.block_until_ready(fn(*args))  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


@functools.partial(jax.jit, static_argnames=("rate",))
def xla_dropout(x, key, rate):
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


@functools.partial(jax.jit, static_argnames=("rate",))
def xla_dropout_grad(x, g, key, rate):
    return jax.grad(
        lambda x: jnp.sum(xla_dropout(x, key, rate) * g)
    )(x)


@functools.partial(jax.jit, static_argnames=("rate",))
def pl_dropout(x, seed, rate):
    return fused_dropout(x, seed, rate)


@functools.partial(jax.jit, static_argnames=("rate",))
def pl_dropout_grad(x, g, seed, rate):
    return jax.grad(
        lambda x: jnp.sum(fused_dropout(x, seed, rate) * g)
    )(x)


def main():
    print("platform:", jax.devices()[0].platform, jax.devices()[0])
    key = jax.random.PRNGKey(0)
    seed = jnp.uint32(1234)
    for shape in SHAPES:
        n = int(np.prod(shape))
        x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
        g = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32)
        gb = n * 4 / 1e9
        fx = timeit(lambda: xla_dropout(x, key, RATE))
        fp = timeit(lambda: pl_dropout(x, seed, RATE))
        bx = timeit(lambda: xla_dropout_grad(x, g, key, RATE))
        bp = timeit(lambda: pl_dropout_grad(x, g, seed, RATE))
        # effective traffic: fwd = read+write = 2 passes
        print(
            "%-18s %6.1fM  fwd xla %7.3f ms (%5.0f GB/s) | pallas %7.3f ms "
            "(%5.0f GB/s)  %4.2fx   grad xla %7.3f | pallas %7.3f  %4.2fx"
            % (str(shape), n / 1e6,
               fx, 2 * gb / (fx / 1e3), fp, 2 * gb / (fp / 1e3), fx / fp,
               bx, bp, bx / bp),
            flush=True,
        )
        # sanity: pallas keep fraction
        kept = float(jnp.mean(pl_dropout(x, seed, RATE) != 0))
        assert abs(kept - (1 - RATE)) < 0.01, kept


if __name__ == "__main__":
    main()
