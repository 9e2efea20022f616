"""Dev bench: STF attention plain vs blockwise at WSJ sequence lengths.

Canonical STF-WSJ: L=20, D=256, FF=1488, 4 heads, penalty zero/stripe=1
scale=1 (reference: egs/script/train_stf_wsj.sh:5-7, conf). The WSJ frame
budget is 24,000 frames/batch, so long buckets mean small batches:
T'=600 -> batch 10, T'=1000 -> batch 6, T'=2500 -> batch 2.

Run: python tools_dev/bench_stf_attention.py [--layers 20] [--train]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(impl, t_post, batch, layers, d_model=256, dff=1488, heads=4):
    from srf_tpu.models.stf import ConvEncoder
    from srf_tpu.ops.attention_penalty import AttentionPenalty
    from srf_tpu.ops.blockwise_attention import PenaltyParams
    from srf_tpu.ops.masking import get_padding_bias
    from srf_tpu.train.optimizer import noam_schedule
    from srf_tpu.train.state import TrainState

    vocab = 32
    ap = AttentionPenalty(2500, heads, 1, 1, 1.0)
    pen = PenaltyParams(1, 1, 1.0, ap.n_stripes)
    model = ConvEncoder(
        num_layers=layers, d_model=d_model, num_heads=heads, dff=dff,
        feat_dim=123, vocab_n=vocab, nfilt=64, cnn_n=2,
        attention_impl=impl, penalty_params=pen,
    )
    frames = t_post * 4
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    feats = jnp.asarray(host.randn(batch, frames, 123), jnp.float32)
    lens = jnp.asarray(
        host.randint(int(frames * 0.8), frames + 1, size=batch), jnp.int32
    )
    labels = jnp.asarray(host.randint(1, vocab - 1, size=(batch, 120)),
                         jnp.int32)
    tar_len = jnp.full((batch,), 120, jnp.int32)
    mask = get_padding_bias(lens, t_post, 4)
    board = None
    if impl == "plain":
        board = ap.penalty(t_post)[None]

    variables = jax.jit(
        lambda r, f, l, m: model.init(r, f, l, False, m, None, 4)
    )({"params": rng, "dropout": rng}, feats[:1], lens[:1], mask[:1])
    tx = optax.adam(noam_schedule(0.5, d_model, 1200))
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats", {}))

    from srf_tpu.ops.ctc import ctc_loss_from_frames

    def loss_fn(params, bstats):
        out = model.apply(
            {"params": params, "batch_stats": bstats}, feats, lens, True,
            mask, board, 4, rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        logits = out[0].astype(jnp.float32)
        return jnp.mean(ctc_loss_from_frames(logits, lens, 4, labels,
                                             tar_len))

    @jax.jit
    def train_step(state):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, state.batch_stats
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), loss

    fwd = jax.jit(
        lambda v, f, l, m: model.apply(v, f, l, False, m, board, 4)
    )
    return model, variables, state, train_step, fwd, feats, lens, mask


def main():
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--layers", type=int, default=20)
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--shapes", default="600x10,1000x6,2500x2")
    parser.add_argument("--impls", default="plain,blockwise")
    args = parser.parse_args()

    for shape in args.shapes.split(","):
        t_post, batch = map(int, shape.split("x"))
        for impl in args.impls.split(","):
            try:
                (model, variables, state, train_step, fwd, feats, lens,
                 mask) = build(impl, t_post, batch, args.layers)
                for _ in range(2):
                    out = fwd(variables, feats, lens, mask)
                np.asarray(out[0, 0, 0])
                start = time.perf_counter()
                for _ in range(args.iters):
                    out = fwd(variables, feats, lens, mask)
                np.asarray(out[0, 0, 0])
                fwd_ms = (time.perf_counter() - start) / args.iters * 1e3
                line = "T'=%4d b=%2d %-9s fwd %8.2f ms" % (
                    t_post, batch, impl, fwd_ms
                )
                if args.train:
                    for _ in range(2):
                        state, loss = train_step(state)
                    float(jax.device_get(loss))
                    start = time.perf_counter()
                    for _ in range(args.iters):
                        state, loss = train_step(state)
                    float(jax.device_get(loss))
                    tr_ms = (time.perf_counter() - start) / args.iters * 1e3
                    line += "   train %8.2f ms" % tr_ms
                print(line, flush=True)
            except Exception as exc:  # noqa: BLE001 - bench survey
                print("T'=%4d b=%2d %-9s FAILED: %s"
                      % (t_post, batch, impl, str(exc)[:200]), flush=True)


if __name__ == "__main__":
    main()
