"""Entry point: train/decode the Speech-Transformer (STF) CTC encoder.

CLI-compatible rebuild of the reference's ``tfsr/trainer_tf.py``. Deltas
from trainer_sr mirrored from the reference:

- attention-penalty plumbing (reference: trainer_tf.py:144-146,285),
- the padding-bias mask passed into self-attention
  (reference: trainer_tf.py:141-142, train_helper.py:382-401) — computed
  here inside the jitted step at trace time from the static bucket shape,
- ``in_len_div = conv_layer_num ** conv_stride``
  (reference quirk: trainer_tf.py:302; = 4 for the defaults),
- a full validation pass before training starts
  (reference: trainer_tf.py:336).
"""

import math
import os
import sys

import jax

from srf_tpu.config import Logger, ParseOption
from srf_tpu.models.stf import ConvEncoder
from srf_tpu.ops.attention_penalty import create_attention_penalty
from srf_tpu.ops.masking import get_padding_bias
from srf_tpu.parallel.mesh import (
    batch_sharding, make_global_replicated, make_mesh,
)
from srf_tpu.train.loop import run_decoding, run_training
from srf_tpu.train.optimizer import get_optimizer
from srf_tpu.train.state import TrainState, param_count
from srf_tpu.train.step import make_apply_fn, make_logits_fn, make_train_step, make_valid_step
from srf_tpu.trainer_sr import (
    build_loaders,
    get_data_len,
    state_to_tree,
    tree_to_state,
)
from srf_tpu.utils.checkpoint import load_checkpoint
from srf_tpu.utils.metrics import MeanMetric
from srf_tpu.utils.vocab import get_file_path, load_vocab
from srf_tpu.data.loader import EvalLoader, LazySpeechDataset, SpeechDataset


def make_stf_extra_kwargs(att_pen, in_len_div):
    """Per-batch STF kwargs, evaluated at trace time (static shapes)."""

    def extra(batch):
        frames = batch["feats"].shape[1]
        out_frames = math.ceil(frames / in_len_div)
        mask = get_padding_bias(batch["inp_len"], out_frames, in_len_div)
        pen = att_pen.penalty(out_frames) if att_pen is not None else None
        return {
            "mask": mask,
            "attention_penalty_mask": pen,
            "in_len_div": in_len_div,
        }

    return extra


def stf_state_template(model, config, tx, rng, in_len_div):
    """Fresh STF TrainState from a dummy forward — the SINGLE source of
    the checkpoint tree layout for both the trainer and tools
    (tools/average_ckpt.py): keeping a copy there drifted once already
    (the EMA subtree was missing from the averaging template, so
    averaging an --tpu-ema-decay run's checkpoints failed)."""
    import jax.numpy as jnp

    dummy_feats = jnp.zeros((1, 20, config.feat_dim), jnp.float32)
    dummy_len = jnp.full((1,), 20, jnp.int32)
    variables = jax.jit(
        lambda rngs, feats, lens: model.init(
            rngs, feats, lens, False, mask=None,
            attention_penalty_mask=None, in_len_div=in_len_div,
        )
    )({"params": rng, "dropout": rng}, dummy_feats, dummy_len)
    return TrainState.create(
        variables["params"], tx, variables.get("batch_stats", {}),
        with_ema=(config.tpu_ema_decay > 0.0 or config.tpu_decode_ema),
    )


def main(argv=None):
    from srf_tpu.parallel.distributed import maybe_initialize
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    maybe_initialize()
    enable_compilation_cache()
    logger = Logger(name="srf_tpu_stf", level=Logger.DEBUG).logger
    config = ParseOption(argv or sys.argv, logger).args

    _, _, dec_in_dim, _ = load_vocab(
        get_file_path(config.path_base, config.path_vocab), logger
    )
    dec_out_dim = dec_in_dim + 1
    blank_idx = dec_in_dim
    logger.info(
        "The modified output Dimension %d, blank index %d", dec_out_dim, blank_idx
    )

    pipe_stages = getattr(config, "tpu_pipeline_stages", 1) or 1
    if pipe_stages > 1:
        # (data x pipe) mesh: encoder blocks stream over 'pipe'
        # (parallel/pipeline.py), batch shards over 'data'
        import numpy as np
        from jax.sharding import Mesh

        devs = np.asarray(jax.devices())
        n_data = max(1, len(devs) // pipe_stages)
        if config.tpu_mesh_data > 0:
            n_data = min(n_data, config.tpu_mesh_data)
        mesh = Mesh(
            devs[: n_data * pipe_stages].reshape(n_data, pipe_stages),
            ("data", "pipe"),
        )
    else:
        mesh = make_mesh(config.tpu_mesh_data)
    num_replicas = mesh.shape["data"]

    logger.info("Analysing data samples..")
    train_num, valid_num, test_num = get_data_len(config)
    logger.info(
        "Data number: Train %s, Valid %s, Test %s", train_num, valid_num, test_num
    )

    from srf_tpu.models.registry import (
        stf_in_len_div, validate_stf_attention_kernel,
    )

    att_kernel = validate_stf_attention_kernel(config)
    from srf_tpu.models.registry import validate_dropout_kernel

    validate_dropout_kernel(config, "stf")
    att_pen = create_attention_penalty(config, logger)
    if att_kernel == "blockwise" and att_pen is not None:
        # the dense [1,T',T'] penalty board is the PLAIN path's input;
        # blockwise recomputes the same values per tile from
        # penalty_params, so building (and baking ~T'^2 floats into every
        # compiled bucket) would be pure waste in the long-sequence
        # regime blockwise exists for
        logger.info(
            "attention penalty: closed-form per-tile (blockwise kernel); "
            "the dense board is not materialized"
        )
        att_pen = None
    in_len_div = stf_in_len_div(config, logger)
    model = ConvEncoder.from_config(config, dec_out_dim)
    tx, schedule = get_optimizer(config)

    rng = jax.random.PRNGKey(config.tpu_seed)
    state = stf_state_template(model, config, tx, rng, in_len_div)
    logger.info("Model parameters: %d", param_count(state.params))

    ckpt_manager, restored, epoch_offset = load_checkpoint(
        config, logger, state_to_tree(state),
        params_only=(config.train_max_epoch == 0),
    )
    if restored is not None:
        state = tree_to_state(restored)
    # multi-process: the initial/restored state must be GLOBAL
    # replicated arrays (jit inputs must be globally addressable and
    # orbax refuses host-local arrays in multi-host saves)
    state = make_global_replicated(state, mesh)

    from srf_tpu.ops.specaugment import make_augment_fn

    if pipe_stages > 1:
        from srf_tpu.parallel.pipeline import make_pipeline_apply_fn

        if config.model_encoder_num % pipe_stages:
            raise ValueError(
                "--tpu-pipeline-stages=%d must divide "
                "--model-encoder-num=%d"
                % (pipe_stages, config.model_encoder_num))
        if config.tpu_bf16 or config.tpu_specaug:
            logger.warning(
                "--tpu-bf16/--tpu-specaug are ignored under "
                "--tpu-pipeline-stages (not yet composed)")
        # the pipeline block fn compiles ONE static kernel; 'auto' cannot
        # resolve per bucket there, so it falls to plain with a note
        pipe_impl = "blockwise" if att_kernel == "blockwise" else "plain"
        if att_kernel == "auto":
            logger.info(
                "pipeline: --tpu-attention-kernel=auto resolves to "
                "'plain' under --tpu-pipeline-stages (per-bucket auto "
                "selection is not composed); pass =blockwise explicitly "
                "for long sequences"
            )
        apply_fn = make_pipeline_apply_fn(
            model, mesh, config.tpu_pipeline_microbatch, att_pen,
            in_len_div, remat=config.tpu_pipeline_remat, impl=pipe_impl,
        )
        logger.info(
            "Pipeline parallelism: %d stages x %d data shards, "
            "<=%d microbatches/step", pipe_stages, num_replicas,
            config.tpu_pipeline_microbatch)
    else:
        apply_fn = make_apply_fn(
            model, make_stf_extra_kwargs(att_pen, in_len_div),
            bf16=config.tpu_bf16, augment_fn=make_augment_fn(config))

    if config.train_max_epoch == 0:
        test_ptrn = os.path.join(config.path_base, config.path_test_ptrn)
        ds_cls = (LazySpeechDataset if config.tpu_data_lazy
                  else SpeechDataset)
        test_ds = ds_cls(
            test_ptrn, config.feat_dim, config.prep_max_inp,
            config.prep_max_tar, with_utt_id=True,
        )
        if config.tpu_decode_ema:
            if state.ema_params is None:
                raise ValueError(
                    "--tpu-decode-ema: the checkpoint holds no EMA params "
                    "(was it trained with --tpu-ema-decay > 0?)"
                )
            state = state.replace(params=state.ema_params)
            logger.info("Decoding with EMA params (--tpu-decode-ema)")
        run_decoding(
            config, logger, state, make_logits_fn(apply_fn),
            EvalLoader(test_ds, batch_size=config.tpu_decode_batch,
                       pad_last=config.tpu_decode_pad_last),
            in_len_div,
            beam_width=config.decoding_beam_width,
        )
        ckpt_manager.close()
        return

    train_loader, valid_loader = build_loaders(
        config, logger, num_replicas, seed=config.tpu_seed
    )
    state_sharding = None
    if getattr(config, "tpu_fsdp", False):
        from srf_tpu.parallel.sharding_rules import fsdp_sharding

        state_sharding = fsdp_sharding(state, mesh)
        state = jax.device_put(state, state_sharding)
        logger.info("FSDP: params + optimizer state sharded over 'data'")
    train_step = make_train_step(
        apply_fn, tx, in_len_div, mesh=mesh, donate=config.tpu_donate,
        state_sharding=state_sharding, accum_steps=config.tpu_grad_accum,
        ema_decay=config.tpu_ema_decay,
    )
    valid_step = make_valid_step(
        apply_fn, in_len_div, mesh=mesh, state_sharding=state_sharding
    )

    # pre-training validation pass (reference: trainer_tf.py:336)
    pre_valid = MeanMetric()
    for batch in valid_loader:
        metrics = jax.device_get(
            valid_step(
                state,
                {k: batch[k] for k in ("feats", "labels", "inp_len", "tar_len")},
            )
        )
        pre_valid.update(metrics["loss_sum"], metrics["samples"])
    logger.info("Pre-training Valid Loss %.4f", pre_valid.result())

    metrics_path = (
        os.path.join(config.path_ckpt, "metrics.jsonl") if config.path_ckpt else None
    )
    run_training(
        config, logger, state, train_step, valid_step, train_loader,
        valid_loader, ckpt_manager, epoch_offset, rng, train_num or 1,
        schedule_fn=schedule, metrics_path=metrics_path,
        state_to_save=state_to_tree,
        batch_sharding=batch_sharding(mesh),
        state_from_tree=tree_to_state,
    )
    ckpt_manager.close()


if __name__ == "__main__":
    main()
