"""Dev harness: sweep SDR implementation variants on the real chip.

Times the canonical SRF-TIMIT workload (train fwd+bwd and inference fwd)
across: XLA scan, chunked-u_hat scan (several chunk sizes), bf16, and the
Pallas fused kernel (inference). Prints one line per variant.

Run:  python tools_dev/sweep_sdr.py [--iters 30]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def sync(x):
    return float(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def build(time_chunk=None, routing_impl="xla", bf16=False, routing_remat=True, routing_unroll=1,
          batch=29, frames=241, **model_kw):
    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.train.optimizer import noam_schedule
    from srf_tpu.train.state import TrainState
    from srf_tpu.train.step import make_apply_fn, make_train_step, make_logits_fn

    model = SequenceRouter(
        feat_dim=123, class_n=63, enc_num=7, caps_primary_num=60,
        caps_primary_dim=8, caps_conv_num=30, caps_conv_dim=8,
        caps_class_dim=8, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=64, caps_type="naive",
        time_chunk=time_chunk, routing_impl=routing_impl,
        routing_remat=routing_remat, routing_unroll=routing_unroll,
        **model_kw,
    )
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    lens = host.randint(int(frames * 0.7), frames + 1, size=batch).astype(np.int32)
    batch_data = {
        "feats": jnp.asarray(host.randn(batch, frames, 123), jnp.float32),
        "labels": jnp.asarray(host.randint(1, 62, size=(batch, 30)), np.int32),
        "inp_len": jnp.asarray(lens),
        "tar_len": jnp.asarray(np.maximum(2, lens // 8)),
    }
    variables = model.init({"params": rng, "dropout": rng},
                           batch_data["feats"][:1], batch_data["inp_len"][:1],
                           False)
    tx = optax.adam(noam_schedule(0.5, 1, 1200))
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats", {}))
    apply_fn = make_apply_fn(model, bf16=bf16)
    train_step = make_train_step(apply_fn, tx, 4, mesh=None, donate=False)
    logits_fn = make_logits_fn(apply_fn)
    return train_step, logits_fn, state, batch_data, rng


def time_fn(fn, iters, sync_result):
    out = fn()
    sync(sync_result(out))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(sync_result(out))
    return (time.perf_counter() - start) / iters


def main():
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--only", default=None, help="run a single variant")
    parser.add_argument("--train-only", action="store_true")
    parser.add_argument("--batch", type=int, default=29)
    args = parser.parse_args()

    variants = [
        ("scan", dict()),
        ("scan_unroll4", dict(routing_unroll=4)),
        ("scan_unroll8", dict(routing_unroll=8)),
        ("scan_chunk8", dict(time_chunk=8)),
        ("scan_chunk16", dict(time_chunk=16)),
        ("scan_chunk32", dict(time_chunk=32)),
        ("scan_bf16", dict(bf16=True)),
        ("scan_pre", dict(routing_impl="xla_pre")),
        ("scan_pre_noremat", dict(routing_impl="xla_pre", routing_remat=False)),
        ("scan_deepbf16", dict(routing_bf16=True)),
        ("scan_allbf16", dict(routing_bf16=True, bf16=True)),
        ("scan_flat", dict(routing_impl="xla_flat")),
        ("scan_flat_noremat", dict(routing_impl="xla_flat", routing_remat=False)),
        ("scan_flat_bf16", dict(routing_impl="xla_flat", bf16=True)),
        ("wavefront", dict(routing_impl="wavefront")),
        ("wavefront_noremat", dict(routing_impl="wavefront", routing_remat=False)),
        ("wavefront_bf16", dict(routing_impl="wavefront", bf16=True)),
        ("scan_noremat", dict(routing_remat=False)),
        ("scan_remat_bf16", dict(bf16=True)),
        ("scan_chunk16_bf16", dict(time_chunk=16, bf16=True)),
        ("pallas_train", dict(routing_impl="pallas")),
    ]
    for name, kw in variants:
        if args.only and name != args.only:
            continue
        train_step, logits_fn, state, batch, rng = build(batch=args.batch, **kw)
        t_train = time_fn(
            lambda: train_step(state, batch, rng)[1], args.iters,
            lambda m: m["loss_sum"],
        )
        if args.train_only:
            print("%-20s train %7.2f ms/step (%7.1f utt/s)"
                  % (name, t_train * 1e3, args.batch / t_train), flush=True)
        else:
            t_fwd = time_fn(
                lambda: logits_fn(state, batch), args.iters, lambda x: x
            )
            print(
                "%-20s train %7.2f ms/step (%7.1f utt/s)   fwd %7.2f ms"
                % (name, t_train * 1e3, args.batch / t_train, t_fwd * 1e3),
                flush=True,
            )

    # pallas: inference path
    for name, kw in [("pallas_fwd", dict(routing_impl="pallas"))]:
        if args.only and name != args.only:
            continue
        try:
            _, logits_fn, state, batch, rng = build(batch=args.batch, **kw)
            t_fwd = time_fn(
                lambda: logits_fn(state, batch), args.iters, lambda x: x
            )
            print("%-20s fwd %7.2f ms" % (name, t_fwd * 1e3), flush=True)
        except Exception as e:  # kernel may need tuning per shape
            print("%-20s FAILED: %s" % (name, repr(e)[:200]), flush=True)


if __name__ == "__main__":
    main()
