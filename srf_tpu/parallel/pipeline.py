"""Pipeline parallelism (GPipe microbatching) over a 'pipe' mesh axis.

The reference has no pipeline story at all — its only distribution mode is
single-node mirrored data parallelism (reference: tfsr/trainer_sr.py:139-149,
SURVEY.md §2.10). This module is the TPU-native scaling extension for deep
encoders: the N identical STF ``EncoderBlock``s are split into S contiguous
stages laid out along a ``pipe`` mesh axis; the batch is split into M
microbatches that stream through the stages, activations hopping stage to
stage with ``jax.lax.ppermute`` (one ICI neighbor hop per tick — the
idiomatic TPU pipeline from the scaling-book recipe: pick a mesh, annotate,
let collectives ride ICI).

Shape of the schedule (classic GPipe):

    tick t (0..M+S-2):  stage s computes microbatch  t - s   (when valid)
    bubble fraction = (S-1) / (M+S-1); choose M >= ~4*S to amortize.

Everything is a single jitted computation: the tick loop is a
``lax.scan`` (static trip count), the per-stage block stack is a
``lax.scan`` over stacked block parameters, and gradients flow backward
through the reversed ``ppermute``s automatically (its transpose is the
inverse permutation) — no hand-written backward schedule is needed for
GPipe semantics because XLA re-runs the forward schedule in reverse
during the transpose pass.

Composes with the 'data' axis: on a ``(data, pipe)`` mesh the microbatch
dimension additionally shards over 'data' (pure SPMD — attention is
per-sample so no collectives cross the axes).

Dropout: per-(block, microbatch) PRNG folding keeps training-mode masks
independent across blocks and microbatches; deterministic mode is exactly
the sequential forward (tests/test_pipeline.py asserts value and gradient
parity vs. the plain per-layer loop).
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from srf_tpu.models.layers import EncoderBlock


def stack_block_params(params, num_layers, prefix="enc%d"):
    """[N-leading-axis pytree] from the enc0..enc{N-1} subtrees of a
    ConvEncoder params tree (all blocks are structurally identical)."""
    blocks = [params[prefix % i] for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def unstack_block_params(stacked, num_layers, prefix="enc%d"):
    """Inverse of stack_block_params (for checkpoint round-trips)."""
    return {
        prefix % i: jax.tree.map(lambda x, i=i: x[i], stacked)
        for i in range(num_layers)
    }


def make_stf_block_fn(model, impl="plain"):
    """(block_params, x, mask, att_pen, rng, training) -> x for one STF
    EncoderBlock, matching ConvEncoder's per-layer construction so the
    pipelined math is identical to the sequential loop."""
    block = EncoderBlock(
        model.d_model, model.num_heads, model.dff,
        model.inner_dropout, model.residual_dropout,
        model.attention_dropout, model.init_name,
        attention_impl=impl, penalty_params=model.penalty_params,
    )

    def block_fn(p, x, mask, att_pen, rng, training):
        rngs = {"dropout": rng} if (training and rng is not None) else None
        return block.apply({"params": p}, x, mask, att_pen, training,
                           rngs=rngs)

    return block_fn


def pipeline_blocks(block_fn, stacked_params, x, mask, att_pen, mesh,
                    num_microbatches, axis="pipe", batch_axis=None,
                    rng=None, training=False, remat=False):
    """Run the stacked block stack as an S-stage pipeline over mesh[axis].

    block_fn: (params_one_block, x, mask, att_pen, rng, training) -> x
    stacked_params: pytree with leading axis N (num blocks), N % S == 0.
    x: [B, T, D] block inputs; mask: [B, 1, 1, T] padding bias or None;
    att_pen: broadcastable attention-penalty board or None (replicated).

    Returns [B, T, D], numerically identical to applying the N blocks
    sequentially (deterministic mode). The result is replicated over
    ``axis`` (a psum broadcasts the last stage's outputs), so the head +
    loss run as ordinary SPMD code after this call.
    """
    S = mesh.shape[axis]
    num_blocks = jax.tree.leaves(stacked_params)[0].shape[0]
    if num_blocks % S:
        raise ValueError(
            "num blocks %d not divisible by %d pipeline stages"
            % (num_blocks, S))
    B = x.shape[0]
    M = num_microbatches
    if B % M:
        raise ValueError("batch %d not divisible by %d microbatches" % (B, M))
    mb = B // M
    L_local = num_blocks // S

    x_mb = x.reshape((M, mb) + x.shape[1:])
    mask_mb = (mask.reshape((M, mb) + mask.shape[1:])
               if mask is not None else None)
    has_mask = mask_mb is not None
    has_rng = rng is not None

    def body(local_params, x_mb, mask_mb, att_pen, rng):
        stage = jax.lax.axis_index(axis)
        if has_rng and batch_axis is not None:
            # distinct dropout draws PER DATA SHARD: the rng enters
            # replicated, and folding only (stage, layer, microbatch)
            # would give every data shard identical masks on its rows —
            # correlated dropout across the global batch, unlike the
            # non-pipelined SPMD path
            rng = jax.random.fold_in(
                rng, jax.lax.axis_index(batch_axis)
            )
        T_ticks = M + S - 1

        def run_stage(h, m, mb_idx):
            def blk(h, xs):
                p_i, i_local = xs
                if has_rng:
                    r = jax.random.fold_in(
                        jax.random.fold_in(rng, stage * L_local + i_local),
                        mb_idx,
                    )
                else:
                    r = None
                h = block_fn(p_i, h, m, att_pen, r, training)
                return h, None

            h, _ = jax.lax.scan(
                blk, h, (local_params, jnp.arange(L_local)))
            return h

        if remat:
            run_stage = jax.checkpoint(run_stage)

        def tick(buf, t):
            mb_idx = jnp.clip(t - stage, 0, M - 1)
            inp = jnp.where(stage == 0,
                            x_mb[jnp.clip(t, 0, M - 1)], buf)
            m = mask_mb[mb_idx] if has_mask else None
            h = run_stage(inp, m, mb_idx)
            if S > 1:
                recv = jax.lax.ppermute(
                    h, axis, [(i, i + 1) for i in range(S - 1)])
            else:
                recv = h
            # emit h only where it is a finished microbatch (last stage,
            # past the fill ticks); zeros elsewhere keep the psum exact
            is_out = jnp.logical_and(stage == S - 1, t >= S - 1)
            out_t = jnp.where(is_out, h, jnp.zeros_like(h))
            return recv, out_t

        init = jnp.zeros_like(x_mb[0])
        if hasattr(jax.lax, "pcast"):
            # the carry is device-varying (each stage holds a different
            # microbatch); mark the unvarying zeros init accordingly
            init = jax.lax.pcast(init, (axis,), to="varying")
        _, outs = jax.lax.scan(tick, init, jnp.arange(T_ticks))
        # ticks S-1 .. M+S-2 carry microbatches 0..M-1
        result = outs[S - 1:]
        return jax.lax.psum(result, axis)

    pspec = lambda *names: P(*names)  # noqa: E731
    db = batch_axis  # extra sharding of the microbatch dim (or None)
    in_specs = (
        P(axis),                                  # params: stage-sharded
        pspec(None, db),                          # x_mb [M, mb, T, D]
        pspec(None, db) if has_mask else P(),     # mask_mb
        P(),                                      # att_pen (replicated)
        P(),                                      # rng
    )
    out = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs,
        out_specs=pspec(None, db),
    )(stacked_params, x_mb,
      mask_mb if has_mask else jnp.zeros((), jnp.float32),
      att_pen if att_pen is not None else jnp.zeros((), jnp.float32),
      rng if has_rng else jax.random.PRNGKey(0))
    return out.reshape((B,) + x.shape[1:])


def stacked_param_sharding(mesh, axis="pipe"):
    """NamedSharding pinning a stacked block tree's leading axis to the
    pipeline stages (use as a with_sharding_constraint / device_put spec)."""
    return NamedSharding(mesh, P(axis))


def make_pipeline_apply_fn(model, mesh, num_microbatches, att_pen=None,
                           in_len_div=4, axis="pipe", batch_axis="data",
                           impl="plain", remat=False):
    """An STF forward with the encoder-block stack pipelined over
    mesh[axis], shaped exactly like train/step.make_apply_fn's adapter:

        apply_fn(params, batch_stats, batch, training, rng)
            -> (logits_f32, new_batch_stats)

    so it plugs straight into make_train_step / make_valid_step. The
    front-end ("embed", which owns the BatchNorm stats) and the final
    LayerNorm+Dense ("head") run as replicated SPMD through ConvEncoder's
    stage entry points; the block stack is re-expressed as stacked
    parameters streaming through the pipeline. Values match
    ConvEncoder.__call__ exactly in deterministic mode
    (tests/test_pipeline.py).

    Known cost: the per-block params are re-stacked (jnp.stack of N
    subtrees) and resharded onto mesh[axis] INSIDE every jitted step, so
    each step copies the encoder stack once. Keeping the state in the
    stacked layout would avoid it but changes the checkpoint tree (and
    every consumer: EMA, averaging, export) — deliberate trade-off until
    pipeline runs on real multi-chip hardware where the copy is
    measurable.
    """
    from srf_tpu.ops.masking import get_padding_bias

    block_fn = make_stf_block_fn(model, impl=impl)
    stacked_sharding = stacked_param_sharding(mesh, axis)
    use_batch_axis = (
        batch_axis if mesh.shape.get(batch_axis, 1) > 1 else None
    )

    def apply_fn(params, batch_stats, batch, training, rng):
        feats = batch["feats"]
        input_lengths = batch["inp_len"]
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        frames = feats.shape[1]
        out_frames = -(-frames // in_len_div)
        mask = get_padding_bias(input_lengths, out_frames, in_len_div)
        pen = att_pen.penalty(out_frames) if att_pen is not None else None
        emb_rngs = {"dropout": rng} if (training and rng is not None) else None
        if training:
            (emb, _), mutated = model.apply(
                variables, feats, input_lengths, True,
                in_len_div=in_len_div, stage="embed", rngs=emb_rngs,
                mutable=["batch_stats"],
            )
            new_stats = mutated.get("batch_stats", {})
        else:
            emb, _ = model.apply(
                variables, feats, input_lengths, False,
                in_len_div=in_len_div, stage="embed",
            )
            new_stats = batch_stats
        stacked = stack_block_params(params, model.num_layers)
        stacked = jax.lax.with_sharding_constraint(stacked, stacked_sharding)
        blk_rng = (jax.random.fold_in(rng, 104729)
                   if (training and rng is not None) else None)
        # bucketed batch sizes vary per compiled shape; use the largest
        # microbatch count <= requested that divides the per-data-shard
        # batch (resolved at trace time, so each bucket compiles its own
        # schedule; the microbatch dim additionally shards over 'data')
        bsz = feats.shape[0]  # do not shadow the `batch` dict param
        nd = mesh.shape.get(batch_axis, 1) if use_batch_axis else 1
        per_shard = bsz // nd
        m_eff = max(1, min(num_microbatches, per_shard))
        while per_shard % m_eff:
            m_eff -= 1
        out = pipeline_blocks(
            block_fn, stacked, emb, mask, pen, mesh, m_eff,
            axis=axis, batch_axis=use_batch_axis, rng=blk_rng,
            training=training, remat=remat,
        )
        logits = model.apply({"params": params}, out, stage="head")
        return logits.astype(jnp.float32), new_stats

    return apply_fn
