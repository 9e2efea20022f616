"""Entry point: train/decode SRF, LSTM and CNN CTC models.

CLI-compatible rebuild of the reference's ``tfsr/trainer_sr.py``: same flags
(conf-file + command-line merge), same model dispatch
(reference: trainer_sr.py:175-201), same epoch/early-stop/checkpoint
behavior, same decode log format. The runtime underneath is TPU-native:
a jax.sharding.Mesh data-parallel jitted step over static bucket shapes.

Usage:
    python -m srf_tpu.trainer_sr --config=egs/conf/timit.conf --path-base=...
"""

import os
import sys

import jax

from srf_tpu.config import Logger, ParseOption
from srf_tpu.data.bucketing import get_bucket_info, round_batch_sizes
from srf_tpu.data.loader import (
    BucketedLoader, EvalLoader, LazySpeechDataset, SpeechDataset,
)
from srf_tpu.data.tfrecord import count_records
from srf_tpu.models.registry import build_model
from srf_tpu.parallel.mesh import (
    batch_sharding, make_global_replicated, make_mesh,
)
from srf_tpu.train.loop import run_decoding, run_training
from srf_tpu.train.optimizer import get_optimizer
from srf_tpu.train.state import TrainState, param_count
from srf_tpu.train.step import make_apply_fn, make_logits_fn, make_train_step, make_valid_step
from srf_tpu.utils.checkpoint import load_checkpoint
from srf_tpu.utils.vocab import get_file_path, load_vocab


def get_data_len(config):
    """Record counts per split (reference: data_helper.py:30-48)."""
    nums = []
    for num, ptrn in [
        (config.prep_data_num_train, config.path_train_ptrn),
        (config.prep_data_num_valid, config.path_valid_ptrn),
        (config.prep_data_num_test, config.path_test_ptrn),
    ]:
        if num is None and ptrn:
            num = count_records(os.path.join(config.path_base, ptrn))
        nums.append(num)
    return tuple(nums)


def build_loaders(config, logger, num_replicas, seed=0):
    """(train_loader, valid_loader) with static bucket shapes."""
    feat_dim = config.feat_dim
    train_ptrn = os.path.join(config.path_base, config.path_train_ptrn)
    valid_ptrn = os.path.join(config.path_base, config.path_valid_ptrn)
    ds_cls = (LazySpeechDataset if getattr(config, "tpu_data_lazy", False)
              else SpeechDataset)
    n_proc = jax.process_count()
    shard_batches = (
        n_proc > 1
        and getattr(config, "tpu_data_shard", "example") == "batch"
    )
    # batch sharding (AutoShardPolicy.DATA semantics): every process scans
    # the FULL corpus and slices each global batch; example sharding:
    # round-robin ownership + lockstep-planned schedules
    ds_proc = (0, 1) if shard_batches else (
        jax.process_index(), jax.process_count())
    train_ds = ds_cls(
        train_ptrn, feat_dim, config.prep_max_inp, config.prep_max_tar,
        process_index=ds_proc[0], process_count=ds_proc[1],
    )
    valid_ds = ds_cls(
        valid_ptrn, feat_dim, config.prep_max_inp, config.prep_max_tar,
        process_index=ds_proc[0], process_count=ds_proc[1],
    )
    if shard_batches and not getattr(config, "tpu_data_lazy", False):
        logger.info(
            "batch sharding loads the FULL split on every process; use "
            "--tpu-data-lazy=True to keep resident memory O(index)")
    if config.train_batch_dynamic:
        assert config.train_batch_frame and config.train_batch_frame > 0
        boundaries, batch_sizes = get_bucket_info(
            config.train_batch_frame, num_replicas, 241, 10000, 150,
            step_for_bucket_size=False,
            manual_bucket_batch_sizes=config.train_batch_buckets,
        )
        batch_sizes = round_batch_sizes(batch_sizes, num_replicas)
        logger.info("bucket_boundaries: [%s]", ", ".join(map(str, boundaries)))
        logger.info("bucket_batch_sizes: [%s]", ", ".join(map(str, batch_sizes)))
        if n_proc > 1:
            # each process's loader yields its 1/n_proc share of every
            # GLOBAL bucket batch; the bucket-shape sequence is globally
            # agreed via plan_lockstep_epoch (example mode) or is the
            # deterministic full-corpus schedule itself (batch mode)
            if any(bs % n_proc for bs in batch_sizes):
                raise ValueError(
                    "bucket batch sizes %s must divide across %d processes"
                    " — every process must contribute the same number of"
                    " devices to the data axis" % (batch_sizes, n_proc)
                )
            if not shard_batches:
                batch_sizes = [bs // n_proc for bs in batch_sizes]
            logger.info(
                "multi-process buckets: local sizes [%s] x %d processes "
                "(%s)",
                ", ".join(str(bs // (n_proc if shard_batches else 1))
                          for bs in batch_sizes),
                n_proc,
                "global-batch slices" if shard_batches
                else "globally scheduled lockstep",
            )
    else:
        assert config.train_batch_size and config.train_batch_size > 0
        # the GLOBAL batch, rounded to the replica count; each process's
        # loader yields its 1/n_proc share (put_sharded assembles the
        # global array from the per-process local batches)
        global_batch = max(
            num_replicas,
            config.train_batch_size // num_replicas * num_replicas,
        )
        boundaries = []
        batch_sizes = [global_batch if shard_batches
                       else global_batch // n_proc]
        if n_proc > 1:
            logger.info(
                "multi-process batches: global %d = %d/process x %d "
                "processes (shapes + per-epoch step count synchronized)",
                global_batch, global_batch // n_proc, n_proc,
            )
    loader_kw = dict(
        global_sync=n_proc > 1 and not shard_batches,
        shard_batches=shard_batches,
        process_index=jax.process_index(),
        process_count=n_proc,
    )
    train_loader = BucketedLoader(
        train_ds, boundaries, batch_sizes, shuffle=True, seed=seed,
        drop_remainder=True, **loader_kw,
    )
    valid_loader = BucketedLoader(
        valid_ds, boundaries, batch_sizes, shuffle=False,
        drop_remainder=True, **loader_kw,
    )
    return train_loader, valid_loader


def state_template(model, config, tx, rng):
    """Init params/batch_stats with a dummy forward (reference dummy_step:
    trainer_sr.py:241-247)."""
    import jax.numpy as jnp

    dummy_feats = jnp.zeros((1, 20, config.feat_dim), jnp.float32)
    dummy_len = jnp.full((1,), 20, jnp.int32)
    variables = jax.jit(
        lambda rngs, feats, lens: model.init(rngs, feats, lens, False)
    )({"params": rng, "dropout": rng}, dummy_feats, dummy_len)
    with_ema = (getattr(config, "tpu_ema_decay", 0.0) or 0.0) > 0.0 or (
        getattr(config, "tpu_decode_ema", False)
    )
    return TrainState.create(
        variables["params"], tx, variables.get("batch_stats", {}),
        with_ema=with_ema,
    )


def state_to_tree(state):
    tree = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
    }
    # keep pre-EMA checkpoint layouts byte-compatible: the subtree exists
    # only when EMA is on
    if state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    return tree


def tree_to_state(tree):
    return TrainState(
        step=tree["step"],
        params=tree["params"],
        opt_state=tree["opt_state"],
        batch_stats=tree["batch_stats"],
        ema_params=tree.get("ema_params"),
    )


def main(argv=None):
    from srf_tpu.parallel.distributed import maybe_initialize
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    maybe_initialize()
    enable_compilation_cache()
    logger = Logger(name="srf_tpu", level=Logger.DEBUG).logger
    config = ParseOption(argv or sys.argv, logger).args

    _, _, dec_in_dim, _ = load_vocab(
        get_file_path(config.path_base, config.path_vocab), logger
    )
    dec_out_dim = dec_in_dim + 1
    blank_idx = dec_in_dim
    logger.info(
        "The modified output Dimension %d, blank index %d", dec_out_dim, blank_idx
    )

    mesh = make_mesh(config.tpu_mesh_data)
    num_replicas = mesh.shape["data"]
    logger.info("Mesh: %s (%d-way data parallel)", dict(mesh.shape), num_replicas)

    logger.info("Analysing data samples..")
    train_num, valid_num, test_num = get_data_len(config)
    logger.info(
        "Data number: Train %s, Valid %s, Test %s", train_num, valid_num, test_num
    )

    model, in_len_div = build_model(config, dec_out_dim, logger)
    tx, schedule = get_optimizer(config)

    rng = jax.random.PRNGKey(config.tpu_seed)
    state = state_template(model, config, tx, rng)
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

    apply_fn = make_apply_fn(
        model, bf16=config.tpu_bf16, augment_fn=make_augment_fn(config)
    )

    if config.train_max_epoch == 0:
        # decode mode (reference: trainer_sr.py:290-299)
        test_ptrn = os.path.join(config.path_base, config.path_test_ptrn)
        ds_cls = (LazySpeechDataset if config.tpu_data_lazy
                  else SpeechDataset)
        test_ds = ds_cls(
            test_ptrn, config.feat_dim, config.prep_max_inp, config.prep_max_tar,
            with_utt_id=True,
        )
        test_loader = EvalLoader(
            test_ds, batch_size=config.tpu_decode_batch,
            pad_last=config.tpu_decode_pad_last,
        )
        if config.tpu_decode_ema:
            if state.ema_params is None:
                raise ValueError(
                    "--tpu-decode-ema: the checkpoint holds no EMA params "
                    "(was it trained with --tpu-ema-decay > 0?)"
                )
            state = state.replace(params=state.ema_params)
            logger.info("Decoding with EMA params (--tpu-decode-ema)")
        logits_fn = make_logits_fn(apply_fn)
        run_decoding(
            config, logger, state, logits_fn, test_loader, in_len_div,
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
    if config.train_is_mwer:
        # MWER fine-tune: expected word-error over an n-best list
        # (train/mwer.py; the reference's loss_ewerr was never wired)
        from srf_tpu.train.mwer import make_mwer_train_step

        if jax.process_count() > 1:
            logger.info(
                "MWER multi-process: each host n-best-decodes only its "
                "own logit shards; hypothesis arrays reassemble onto the "
                "'data' axis (train/mwer.py)"
            )
        if config.tpu_fsdp:
            logger.warning(
                "MWER mode ignores --tpu-fsdp sharding (plain jit step)"
            )
        if config.tpu_ema_decay > 0:
            logger.warning(
                "MWER mode does not update --tpu-ema-decay EMA params "
                "(the EMA from the pre-fine-tune checkpoint is carried "
                "through unchanged)"
            )

        logits_fn = make_logits_fn(apply_fn)
        # an unset --decoding-beam-width must not mean "unpruned": the
        # host n-best search grows exponentially without a beam cap
        mwer_beam = config.decoding_beam_width or max(
            4 * config.tpu_mwer_nbest, 16
        )
        train_step = make_mwer_train_step(
            apply_fn, logits_fn, tx, in_len_div,
            beam_width=mwer_beam,
            n_best=config.tpu_mwer_nbest, blank_id=blank_idx,
            lam_ctc=config.tpu_mwer_lam_ctc,
            accum_steps=config.tpu_grad_accum,
            mesh=mesh,
        )
        logger.info(
            "MWER fine-tune: beam %d, n-best %d, lambda-CTC %.3f, "
            "grad-accum %d",
            config.decoding_beam_width, config.tpu_mwer_nbest,
            config.tpu_mwer_lam_ctc, config.tpu_grad_accum,
        )
    else:
        train_step = make_train_step(
            apply_fn, tx, in_len_div, mesh=mesh, donate=config.tpu_donate,
            state_sharding=state_sharding,
            accum_steps=config.tpu_grad_accum,
            ema_decay=config.tpu_ema_decay,
        )
    valid_step = make_valid_step(
        apply_fn, in_len_div, mesh=mesh, state_sharding=state_sharding
    )

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
