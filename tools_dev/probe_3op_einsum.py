"""Dev probe: 3-operand einsum formulation of the factored SDR step.

The factored step materializes r=[B,n,o,j] and p=[B,o,n,j] between the
two W contractions; handing XLA the whole 3-operand contraction
(einsum("noij,bnj,boi->bno", W, u, v)) lets its own decomposition pick
the intermediate. Times one canonical-WSJ middle layer as a scan over
T=150, fwd and train (grad wrt W + u), vs the current factored body.

Run: python tools_dev/probe_3op_einsum.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from srf_tpu.ops.squash import squash


def step_factored(u_t, wgt, bias, v):
    r = jnp.einsum("noij,boi->bnoj", wgt, v, preferred_element_type=jnp.float32)
    b = (jnp.einsum("bnoj,bnj->bno", r, u_t, preferred_element_type=jnp.float32)
         + jnp.einsum("noi,boi->bno", bias, v, preferred_element_type=jnp.float32))
    c = jax.nn.softmax(b, axis=2)
    p = jnp.einsum("bno,bnj->bonj", c, u_t, preferred_element_type=jnp.float32)
    s = (jnp.einsum("bonj,noij->boi", p, wgt, preferred_element_type=jnp.float32)
         + jnp.einsum("bno,noi->boi", c, bias, preferred_element_type=jnp.float32))
    return squash(s, axis=-1)


def step_3op(u_t, wgt, bias, v):
    b = (jnp.einsum("noij,bnj,boi->bno", wgt, u_t, v,
                    preferred_element_type=jnp.float32)
         + jnp.einsum("noi,boi->bno", bias, v,
                      preferred_element_type=jnp.float32))
    c = jax.nn.softmax(b, axis=2)
    s = (jnp.einsum("bno,noij,bnj->boi", c, wgt, u_t,
                    preferred_element_type=jnp.float32)
         + jnp.einsum("bno,noi->boi", c, bias,
                      preferred_element_type=jnp.float32))
    return squash(s, axis=-1)


def main():
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    B, T, ch, cd, win = 40, 150, 30, 20, 5
    in_n = ch * win
    host = np.random.RandomState(0)
    u = jnp.asarray(host.randn(T, B, in_n, cd) * 0.3, jnp.float32)
    wgt = jnp.asarray(host.randn(in_n, ch, cd, cd) * 0.05, jnp.float32)
    bias = jnp.asarray(host.randn(in_n, ch, cd) * 0.01, jnp.float32)

    def run_scan(step_fn, u, wgt, bias):
        def body(v, u_t):
            v = step_fn(u_t, wgt, bias, v)
            return v, v
        v0 = jnp.zeros((B, ch, cd), jnp.float32)
        _, vs = jax.lax.scan(jax.checkpoint(body), v0, u)
        return vs

    for name, fn in [("factored", step_factored), ("3op", step_3op)]:
        fwd = jax.jit(lambda u, w, b, f=fn: jnp.sum(run_scan(f, u, w, b) ** 2))
        grad = jax.jit(jax.grad(
            lambda w, u, b, f=fn: jnp.sum(run_scan(f, u, w, b) ** 2),
            argnums=(0, 1),
        ))
        # correctness vs factored
        out = fwd(u, wgt, bias)
        float(jax.device_get(out))
        g = grad(wgt, u, bias)
        float(jax.device_get(g[0].ravel()[0]))
        for tag, f, args in (("fwd", fwd, (u, wgt, bias)),
                             ("train", grad, (wgt, u, bias))):
            start = time.perf_counter()
            iters = 10
            for _ in range(iters):
                r = f(*args)
            float(jax.device_get(jax.tree.leaves(r)[0].ravel()[0]))
            dt = (time.perf_counter() - start) / iters * 1e3
            print("%-9s %-5s %7.2f ms/layer" % (name, tag, dt), flush=True)
    # numeric agreement
    a = jax.jit(lambda: run_scan(step_factored, u, wgt, bias))()
    b = jax.jit(lambda: run_scan(step_3op, u, wgt, bias))()
    print("max|diff| =", float(jnp.max(jnp.abs(a - b))))


if __name__ == "__main__":
    main()
