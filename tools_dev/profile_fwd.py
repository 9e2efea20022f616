"""Dev harness: attribute forward time across model stages on the real chip.

Times, on the canonical SRF-TIMIT shape: (a) the conv front-end +
capsulation alone, (b) k capsule layers for k = 0..enc_num with the rest
of the model intact, for a chosen routing impl. The deltas attribute
per-stage cost. Run:  python tools_dev/profile_fwd.py [--impl xla] [--iters 30]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def build(enc_num, impl, batch=29, frames=241):
    from srf_tpu.models.srf import SequenceRouter

    model = SequenceRouter(
        feat_dim=123, class_n=63, enc_num=enc_num, caps_primary_num=60,
        caps_primary_dim=8, caps_conv_num=30, caps_conv_dim=8,
        caps_class_dim=8, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=64, caps_type="naive",
        routing_impl=impl,
    )
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    feats = jnp.asarray(host.randn(batch, frames, 123), jnp.float32)
    lens = jnp.asarray(
        host.randint(int(frames * 0.7), frames + 1, size=batch), jnp.int32
    )
    variables = jax.jit(
        lambda r, f, l: model.init(r, f, l, False)
    )({"params": rng, "dropout": rng}, feats[:1], lens[:1])
    fwd = jax.jit(lambda f, l: model.apply(variables, f, l, False))
    return fwd, feats, lens


def time_fn(fn, iters):
    out = fn()
    sync(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - start) / iters


def main():
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--impl", default="xla")
    parser.add_argument("--layers", type=int, nargs="*", default=[1, 4, 7])
    args = parser.parse_args()

    prev = None
    for enc_num in args.layers:
        fwd, feats, lens = build(enc_num, args.impl)
        t = time_fn(lambda: fwd(feats, lens), args.iters)
        delta = "" if prev is None else "  (+%.2f ms)" % ((t - prev) * 1e3)
        print("enc_num=%d  fwd %7.2f ms%s" % (enc_num, t * 1e3, delta),
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
