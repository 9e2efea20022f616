"""Dev sweep: decompose the SRF-WSJ canonical step cost on the real chip.

Times forward-only and full train step across controlled variants of the
canonical WSJ shape (L=10, PH=60, CH=30, D=20, window 2+2+1, batch 40x600)
to localize the dominant cost: layer count, capsule dim, window size,
remat, kernel impl.

Run: python tools_dev/sweep_wsj.py [--iters 5] [--variants base,L4,...]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(impl="xla", enc_num=10, cd=20, lpad=2, rpad=2, remat=True,
          batch=40, frames=600, bf16=False):
    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.train.optimizer import noam_schedule
    from srf_tpu.train.state import TrainState
    from srf_tpu.train.step import make_apply_fn, make_train_step

    vocab = 31
    model = SequenceRouter(
        feat_dim=123, class_n=vocab + 1, enc_num=enc_num, caps_primary_num=60,
        caps_primary_dim=cd, caps_conv_num=30, caps_conv_dim=cd,
        caps_class_dim=cd, caps_iter=1, lpad=lpad, rpad=rpad, is_context=True,
        conv_layer_num=2, conv_filter_num=64, caps_type="lowmemory",
        routing_impl=impl, routing_remat=remat, routing_bf16=bf16,
    )
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    lens = host.randint(int(frames * 0.7), frames + 1, size=batch).astype(np.int32)
    data = {
        "feats": jnp.asarray(host.randn(batch, frames, 123), jnp.float32),
        "labels": jnp.asarray(host.randint(1, vocab, size=(batch, 90)), np.int32),
        "inp_len": jnp.asarray(lens),
        "tar_len": jnp.asarray(np.maximum(2, lens // 8)),
    }
    variables = jax.jit(
        lambda r, f, l: model.init(r, f, l, False)
    )({"params": rng, "dropout": rng}, data["feats"][:1], data["inp_len"][:1])
    tx = optax.adam(noam_schedule(0.5, 1, 1200))
    state = TrainState.create(variables["params"],
                              tx, variables.get("batch_stats", {}))
    train_step = make_train_step(make_apply_fn(model), tx, 4, mesh=None,
                                 donate=False)
    fwd = jax.jit(lambda v, f, l: model.apply(v, f, l, False))
    return model, variables, state, train_step, fwd, data, rng


def time_it(fn, sync, iters):
    for _ in range(2):
        out = fn()
    sync(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - start) / iters * 1e3


VARIANTS = {
    "base":      dict(),
    "wavefront": dict(impl="wavefront"),
    "L4":        dict(enc_num=4),
    "L2":        dict(enc_num=2),
    "D8":        dict(cd=8),
    "win1":      dict(lpad=1, rpad=1),
    "noremat":   dict(remat=False),
    "wf_L4":     dict(impl="wavefront", enc_num=4),
    "factored":  dict(impl="xla_factored"),
    "fac_timit": dict(impl="xla_factored", enc_num=7, cd=8, lpad=1, rpad=1,
                      batch=29, frames=241),
    "xla_timit": dict(enc_num=7, cd=8, lpad=1, rpad=1, batch=29, frames=241),
    "fac_b80":   dict(impl="xla_factored", batch=80),
    "wf_timit":  dict(impl="wavefront", enc_num=7, cd=8, lpad=1, rpad=1,
                      batch=29, frames=241),
    "fac_bf16":  dict(impl="xla_factored", bf16=True),
    "fac_noremat": dict(impl="xla_factored", remat=False),
    "fac_noremat_timit": dict(impl="xla_factored", remat=False, enc_num=7,
                              cd=8, lpad=1, rpad=1, batch=29, frames=241),
    "fac_bf16_timit": dict(impl="xla_factored", bf16=True, enc_num=7, cd=8,
                           lpad=1, rpad=1, batch=29, frames=241),
}


def main():
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--variants", default="base,L4,L2,D8,win1,noremat")
    parser.add_argument("--train", action="store_true", default=False)
    args = parser.parse_args()

    for name in args.variants.split(","):
        kw = VARIANTS[name]
        model, variables, state, train_step, fwd, data, rng = build(**kw)
        fwd_ms = time_it(
            lambda: fwd(variables, data["feats"], data["inp_len"]),
            lambda o: np.asarray(o[0, 0, 0]), args.iters,
        )
        line = "%-10s fwd %8.2f ms" % (name, fwd_ms)
        if args.train:
            st = state
            def step():
                nonlocal st
                st, m = train_step(st, data, rng)
                return m
            tr_ms = time_it(
                step, lambda m: float(jax.device_get(m["loss_sum"])),
                args.iters,
            )
            line += "   train %8.2f ms" % tr_ms
        print(line, flush=True)


if __name__ == "__main__":
    main()
