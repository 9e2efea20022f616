"""Dev probe: is the train step host-dispatch-bound on the remote chip?

Times (a) N separate train_step dispatches vs (b) one jitted lax.scan over
N stacked batches (same data). A large gap means per-call dispatch latency
inflates the measured ms/step and a --tpu-steps-per-call loop mode pays.

Run: python tools_dev/multistep_probe.py [--n 8] [--iters 10]
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
    parser.add_argument("--n", type=int, default=8)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    from srf_tpu.models.srf import SequenceRouter
    from srf_tpu.train.optimizer import noam_schedule
    from srf_tpu.train.state import TrainState
    from srf_tpu.train.step import make_apply_fn
    from srf_tpu.ops.ctc import ctc_loss_from_frames

    model = SequenceRouter(
        feat_dim=123, class_n=63, enc_num=7, caps_primary_num=60,
        caps_primary_dim=8, caps_conv_num=30, caps_conv_dim=8,
        caps_class_dim=8, caps_iter=1, lpad=1, rpad=1, is_context=True,
        conv_layer_num=2, conv_filter_num=64, caps_type="naive",
    )
    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    batch, frames = 29, 241
    lens = host.randint(int(frames * 0.7), frames + 1, size=batch).astype(np.int32)
    one = {
        "feats": jnp.asarray(host.randn(batch, frames, 123), jnp.float32),
        "labels": jnp.asarray(host.randint(1, 62, size=(batch, 30)), np.int32),
        "inp_len": jnp.asarray(lens),
        "tar_len": jnp.asarray(np.maximum(2, lens // 8)),
    }
    variables = model.init({"params": rng, "dropout": rng},
                           one["feats"][:1], one["inp_len"][:1], False)
    tx = optax.adam(noam_schedule(0.5, 1, 1200))
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats", {}))
    apply_fn = make_apply_fn(model)

    def step_body(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits, new_stats = apply_fn(params, state.batch_stats, batch,
                                         True, step_rng)
            pe = ctc_loss_from_frames(logits, batch["inp_len"], 4,
                                      batch["labels"], batch["tar_len"])
            return jnp.sum(pe) / batch["feats"].shape[0], new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt, batch_stats=new_stats), loss

    single = jax.jit(step_body, donate_argnums=(0,))

    def multi(state, batches, rng):
        def body(s, b):
            s, loss = step_body(s, b, rng)
            return s, loss
        return jax.lax.scan(body, state, batches)

    multi_jit = jax.jit(multi, donate_argnums=(0,))
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (args.n,) + x.shape), one
    )

    def sync(x):
        return float(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))

    # single-dispatch loop
    for _ in range(2):
        state, loss = single(state, one, rng)
    sync(loss)
    start = time.perf_counter()
    for _ in range(args.iters * args.n):
        state, loss = single(state, one, rng)
    sync(loss)
    t_single = (time.perf_counter() - start) / (args.iters * args.n)

    # multi-step dispatch
    state, losses = multi_jit(state, stacked, rng)
    sync(losses)
    start = time.perf_counter()
    for _ in range(args.iters):
        state, losses = multi_jit(state, stacked, rng)
    sync(losses)
    t_multi = (time.perf_counter() - start) / (args.iters * args.n)

    print("single-dispatch: %7.2f ms/step" % (t_single * 1e3), flush=True)
    print("scan x%d       : %7.2f ms/step" % (args.n, t_multi * 1e3),
          flush=True)


if __name__ == "__main__":
    main()
