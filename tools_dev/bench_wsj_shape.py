"""Dev bench: canonical SRF-WSJ training throughput on the real chip.

The WSJ recipe (reference: egs/script/train_srf_wsj.sh:5-10,44 + conf:
L=10, PH=60, CH=30, D=20, window 2+2+1, lowmemory SDR iter 1, 24,000-frame
bucket budget). Representative bucket: 600-frame utterances -> batch 40.

Run: python tools_dev/bench_wsj_shape.py [--iters 10]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--batch", type=int, default=40)
    parser.add_argument("--frames", type=int, default=600)
    parser.add_argument("--impl", default="xla")
    args = parser.parse_args()

    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.train.optimizer import noam_schedule
    from srf_tpu.train.state import TrainState
    from srf_tpu.train.step import make_apply_fn, make_train_step

    vocab = 31  # wsj_31.vocab
    model = SequenceRouter(
        feat_dim=123, class_n=vocab + 1, enc_num=10, caps_primary_num=60,
        caps_primary_dim=20, caps_conv_num=30, caps_conv_dim=20,
        caps_class_dim=20, caps_iter=1, lpad=2, rpad=2, is_context=True,
        conv_layer_num=2, conv_filter_num=64, caps_type="lowmemory",
        routing_impl=args.impl,
    )
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    batch, frames = args.batch, args.frames
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

    def sync(m):
        return float(jax.device_get(m["loss_sum"]))

    for _ in range(3):
        state, metrics = train_step(state, data, rng)
    sync(metrics)
    start = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = train_step(state, data, rng)
    sync(metrics)
    dt = (time.perf_counter() - start) / args.iters
    print("SRF-WSJ canonical [%s]: %7.2f ms/step  (%6.1f utt/s/chip, "
          "batch %d x %d)" % (args.impl, dt * 1e3, batch / dt, batch, frames),
          flush=True)


if __name__ == "__main__":
    main()
