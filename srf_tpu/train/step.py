"""Jitted train/valid/decode steps, data-parallel over the mesh.

Replaces the reference's per-replica ``strategy.run(process_train_step)``
(reference: tfsr/trainer_sr.py:41-117,205-238) with single jitted functions
compiled over the whole mesh: the batch arrives sharded on the 'data' axis,
parameters are replicated, and XLA inserts the gradient psum. Loss scaling
matches ``tf.nn.compute_average_loss(pe_loss, global_batch_size=B_global)``
(reference: trainer_sr.py:57-68) — here the jitted step sees the global
batch, so it is simply ``sum(pe_loss) / B_global``.

Unlike the reference (which crops each batch to the batch-max length,
trainer_sr.py:59-60, retracing per shape), batches keep their static bucket
shape and padding is handled by masks — one compilation per bucket shape.
"""


import jax
import jax.numpy as jnp

from srf_tpu.ops.ctc import ctc_loss_from_frames
from srf_tpu.parallel.mesh import batch_sharding, replicated


def make_apply_fn(model, extra_kwargs_fn=None, bf16=False, augment_fn=None):
    """Uniform apply adapter: (variables, batch, training, rng) -> logits[, mut].

    ``extra_kwargs_fn(batch)`` supplies model-specific keyword arguments (the
    STF encoder's padding-bias mask and attention-penalty slice); it runs at
    trace time, so shape-dependent constants fold into the compiled program.

    ``bf16=True`` enables mixed precision: parameters and features are cast
    to bfloat16 at the apply boundary (master params stay float32 in the
    optimizer; the cast is differentiable so gradients accumulate in f32),
    logits are cast back to float32 before the CTC loss.

    ``augment_fn(feats, inp_len, rng)`` (ops/specaugment.make_augment_fn)
    runs in TRAINING mode only, inside the jitted step.
    """

    def apply_fn(params, batch_stats, batch, training, rng):
        feats = batch["feats"]
        if augment_fn is not None and training:
            feats = augment_fn(
                feats, batch["inp_len"], jax.random.fold_in(rng, 7919)
            )
        if bf16:
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params,
            )
            feats = feats.astype(jnp.bfloat16)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        kwargs = extra_kwargs_fn(batch) if extra_kwargs_fn else {}
        if training:
            out, mutated = model.apply(
                variables, feats, batch["inp_len"], True,
                rngs={"dropout": rng}, mutable=["batch_stats"], **kwargs,
            )
            new_stats = mutated.get("batch_stats", {})
            if bf16:
                new_stats = jax.tree.map(
                    lambda x: x.astype(jnp.float32), new_stats
                )
            return out.astype(jnp.float32), new_stats
        out = model.apply(variables, feats, batch["inp_len"], False, **kwargs)
        return out.astype(jnp.float32), batch_stats

    return apply_fn


def make_train_step(apply_fn, tx, in_len_div, mesh=None, donate=True,
                    state_sharding=None, accum_steps=1, ema_decay=0.0):
    """``accum_steps > 1`` splits the batch into that many microbatches and
    accumulates gradients before the single optimizer update
    (--tpu-grad-accum): live activation memory drops ~accum_steps-fold
    while the update is mathematically the full-batch one (gradients are
    linear in the per-example losses; loss scaling stays
    sum(pe)/B_global). BatchNorm running stats advance per microbatch
    (sequential EMA rather than one big-batch update — standard for
    accumulation); dropout draws differ per microbatch.

    ``ema_decay > 0`` (--tpu-ema-decay) additionally tracks
    ``ema += (1-decay) * (params - ema)`` after the update — one fused
    elementwise pass per step, so it costs nothing next to the matmuls.
    Requires ``state.ema_params`` (TrainState.create(with_ema=True)).
    """

    def train_step(state, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        global_batch = batch["feats"].shape[0]

        def loss_fn(params, batch_stats, mb, mb_rng):
            logits, new_stats = apply_fn(
                params, batch_stats, mb, True, mb_rng
            )
            pe_loss = ctc_loss_from_frames(
                logits, mb["inp_len"], in_len_div,
                mb["labels"], mb["tar_len"],
            )
            loss = jnp.sum(pe_loss) / global_batch
            return loss, (pe_loss, new_stats)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        if accum_steps <= 1:
            (loss, (pe_loss, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, batch, step_rng
            )
            loss_sum = jnp.sum(pe_loss)
        else:
            # bucket batch sizes vary (frame-budget bucketing), so instead
            # of erroring on indivisible shapes, use the largest divisor of
            # this bucket's batch <= accum_steps (trace-time choice; each
            # bucket shape compiles once)
            k = accum_steps
            while global_batch % k:
                k -= 1
            mb_size = global_batch // k

            def micro(carry, i):
                grads_acc, loss_acc, stats = carry
                mb = {
                    k: jax.lax.dynamic_slice_in_dim(v, i * mb_size, mb_size)
                    for k, v in batch.items()
                }
                (_, (pe, new_stats)), g = grad_fn(
                    state.params, stats, mb, jax.random.fold_in(step_rng, i)
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return (grads_acc, loss_acc + jnp.sum(pe), new_stats), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss_sum, new_stats), _ = jax.lax.scan(
                micro, (zero_grads, jnp.float32(0.0), state.batch_stats),
                jnp.arange(k),
            )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_ema = state.ema_params
        if ema_decay > 0.0 and state.ema_params is not None:
            d = jnp.float32(1.0 - ema_decay)
            new_ema = jax.tree.map(
                lambda e, p: e + d * (p - e), state.ema_params, new_params
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_stats,
            ema_params=new_ema,
        )
        metrics = {
            "loss_sum": loss_sum,
            "samples": jnp.asarray(global_batch, jnp.float32),
            "frames": jnp.sum(batch["inp_len"]).astype(jnp.float32),
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    repl = replicated(mesh)
    data = batch_sharding(mesh)
    batch_shardings = {
        "feats": data, "labels": data, "inp_len": data, "tar_len": data,
    }
    state_in = state_sharding if state_sharding is not None else repl
    return jax.jit(
        train_step,
        in_shardings=(state_in, batch_shardings, repl),
        out_shardings=(state_in, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_valid_step(apply_fn, in_len_div, mesh=None, state_sharding=None):
    def valid_step(state, batch):
        logits, _ = apply_fn(state.params, state.batch_stats, batch, False, None)
        pe_loss = ctc_loss_from_frames(
            logits, batch["inp_len"], in_len_div,
            batch["labels"], batch["tar_len"],
        )
        return {
            "loss_sum": jnp.sum(pe_loss),
            "samples": jnp.asarray(batch["feats"].shape[0], jnp.float32),
        }

    if mesh is None:
        return jax.jit(valid_step)
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    batch_shardings = {
        "feats": data, "labels": data, "inp_len": data, "tar_len": data,
    }
    state_in = state_sharding if state_sharding is not None else repl
    return jax.jit(
        valid_step, in_shardings=(state_in, batch_shardings),
        out_shardings=repl,
    )


def make_logits_fn(apply_fn):
    """Jitted inference logits for decoding.

    Only feats/inp_len cross the jit boundary: jax.jit keys its cache on
    the avals of EVERY input, and eval batches pad labels to each batch's
    exact max label length (data/loader.py _pad_batch) — passing the
    (unused) labels through would recompile per unique transcript length,
    defeating the pad_multiple shape bounding on the decode path."""

    def logits_fn(params, batch_stats, feats, inp_len):
        batch = {"feats": feats, "inp_len": inp_len}
        logits, _ = apply_fn(params, batch_stats, batch, False, None)
        return logits

    jitted = jax.jit(logits_fn)

    def call(state, batch):
        return jitted(
            state.params, state.batch_stats, batch["feats"], batch["inp_len"]
        )

    return call
