"""Dev probe: where does the trainer's per-step wall time go?

The dress-rehearsal smoke measured ~515 ms/step through the real trainer
CLI at the TIMIT b7000 geometry while bench.py's canonical train row is
17.4 ms/step (b29, 241 frames). This times the REAL jitted train_step
(same construction path as srf_tpu.trainer_sr) at each bucket shape the
dress corpus produces, back-to-back on device, separating compile, steady
dispatch+compute, and host batch-build.

Run: python tools_dev/diag_train_step.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from srf_tpu.config.options import ParseOption
    from srf_tpu.config.logger import Logger
    from srf_tpu.models.registry import build_model
    from srf_tpu.train.optimizer import get_optimizer
    from srf_tpu.train.step import make_apply_fn, make_train_step
    from srf_tpu.trainer_sr import state_template
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    logger = Logger("diag").logger
    argv = [
        "prog", "--config=egs/conf/timit.conf", "--path-base=/tmp/timit_dress",
        "--train-batch-frame=7000",
        "--train-lr-param-k=0.5", "--train-warmup-n=1200",
        "--model-caps-primary-num=60", "--model-caps-convolution-num=30",
        "--model-caps-primary-dim=8", "--model-caps-convolution-dim=8",
        "--model-caps-class-dim=8", "--model-caps-type=naive",
        "--model-caps-window-lpad=1", "--model-caps-window-rpad=1",
        "--model-caps-context=True", "--model-caps-iter=1",
        "--model-encoder-num=7",
    ]
    config = ParseOption(argv, logger).args
    model, in_len_div = build_model(config, 63, logger)
    tx, schedule = get_optimizer(config)
    rng = jax.random.PRNGKey(0)
    state = state_template(model, config, tx, rng)
    apply_fn = make_apply_fn(model)
    train_step = make_train_step(apply_fn, tx, in_len_div)

    host = np.random.RandomState(0)
    # the b7000 bucket geometry on the dress corpus (boundary, batch)
    for frames, batch in [(241, 29), (391, 17), (541, 12), (691, 10),
                          (781, 8)]:
        b = {
            "feats": jnp.asarray(
                host.randn(batch, frames, 123), jnp.float32),
            "labels": jnp.zeros((batch, frames // 10), jnp.int32),
            "inp_len": jnp.full((batch,), frames, jnp.int32),
            "tar_len": jnp.full((batch,), frames // 10, jnp.int32),
        }
        jax.block_until_ready(b)
        t0 = time.perf_counter()
        state, m = train_step(state, b, rng)
        float(m["loss_sum"])  # a real fetch: the only reliable fence
        compile_s = time.perf_counter() - t0
        # steady state: chained steps (donated), block at the end
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = train_step(state, b, rng)
        float(m["loss_sum"])
        steady = (time.perf_counter() - t0) / n
        print("bucket %4d x %2d: compile %6.1f s   steady %7.1f ms/step "
              "(%6.1f utt/s)" % (frames, batch, compile_s, 1e3 * steady,
                                 batch / steady), flush=True)


if __name__ == "__main__":
    main()
