"""Checkpoint save/restore/resume + checkpoint averaging (orbax).

Reference parity (tfsr/helper/misc_helper.py:139-163,
tfsr/utils/average_ckpt_sr.py:92-180):

- per-epoch checkpoints managed with ``max_to_keep``
  (``--model-ckpt-max-to-keep``, -1 = keep all),
- resume from ``--path-ckpt-epoch`` N or the latest checkpoint; the epoch
  offset is the checkpoint step (the reference parses it from "ckpt-N"),
- checkpoint averaging: element-wise mean of the last ``model_average_num``
  checkpoints' weights saved under ``$ckpt/avg`` — with pytrees this is a
  tree-map, not the reference's rebuild-N-models dance.
"""

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path):
    return os.path.abspath(path)


class CheckpointManager:
    """``use_async=True`` (``--tpu-async-ckpt``) backgrounds the disk write:
    orbax's async checkpointer still performs the device->host copy
    synchronously (so buffer donation by the next train step is safe), then
    serializes in a background thread while training continues. ``save``
    returns immediately; a save is guaranteed durable only after ``wait()``
    (the train loop waits at exit, and every read path waits first)."""

    def __init__(self, path, max_to_keep=None, use_async=False):
        if max_to_keep is not None and max_to_keep < 0:
            max_to_keep = None
        self.path = _abs(path)
        self.use_async = use_async
        os.makedirs(self.path, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True,
            enable_async_checkpointing=use_async,
        )
        self.manager = ocp.CheckpointManager(self.path, options=options)

    def save(self, step, state_dict):
        self.manager.save(step, args=ocp.args.StandardSave(state_dict))
        if not self.use_async:
            self.manager.wait_until_finished()
        return os.path.join(self.path, str(step))

    def wait(self):
        """Block until all pending (async) saves are durable on disk."""
        self.manager.wait_until_finished()

    def restore(self, step, template):
        self.wait()
        return self.manager.restore(step, args=ocp.args.StandardRestore(template))

    def restore_partial(self, step, template):
        """Restore only the subtree present in ``template``.

        Inference needs params (+ batch_stats) but not the optimizer
        state, whose pytree structure depends on the training flags —
        partial restore frees serving/decoding from having to reproduce
        the exact optimizer configuration the checkpoint was trained
        with.

        Unlike orbax's raw partial restore (which silently ignores extra
        checkpoint leaves and tolerates shape mismatches), this validates
        the template against the checkpoint METADATA first: every template
        leaf must exist with the same shape, and every checkpoint leaf
        under a top-level key the template claims (e.g. 'params') must be
        present in the template — so serving with wrong architecture
        flags fails loudly instead of decoding garbage."""
        self.wait()
        # a reopened CheckpointManager returns None from item_metadata
        # until a handler is registered; read the step directory directly
        md = ocp.StandardCheckpointer().metadata(
            os.path.join(self.path, str(step), "default")
        )
        meta = getattr(md.item_metadata, "tree", md.item_metadata)
        flat_meta = {
            jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(meta)[0]
        }
        flat_t = jax.tree_util.tree_flatten_with_path(template)[0]
        t_names = {jax.tree_util.keystr(p) for p, _ in flat_t}
        for path, want in flat_t:
            name = jax.tree_util.keystr(path)
            got = flat_meta.get(name)
            if got is None:
                raise ValueError(
                    "checkpoint %s/%s has no leaf %s — the model flags do "
                    "not describe the trained architecture"
                    % (self.path, step, name)
                )
            if tuple(got.shape) != tuple(want.shape):
                raise ValueError(
                    "shape mismatch at %s: checkpoint %s vs model %s — "
                    "check the model-* flags"
                    % (name, tuple(got.shape), tuple(want.shape))
                )
        claimed = tuple("['%s']" % k for k in template)
        extra = [
            n for n in flat_meta
            if n.startswith(claimed) and n not in t_names
        ]
        if extra:
            raise ValueError(
                "checkpoint %s/%s holds leaves the model does not "
                "(e.g. %s) — the model flags describe a smaller "
                "architecture than the one trained" % (
                    self.path, step, sorted(extra)[:3],
                )
            )
        # explicit restore args from the template's own (current-process)
        # shardings: without them orbax reads the sharding file written at
        # SAVE time, which breaks restoring on a different topology (e.g.
        # train on an 8-device mesh, serve on one chip)
        restore_args = ocp.checkpoint_utils.construct_restore_args(template)
        return self.manager.restore(
            step,
            args=ocp.args.PyTreeRestore(
                item=template, restore_args=restore_args,
                partial_restore=True,
            ),
        )

    def latest_step(self):
        self.wait()
        return self.manager.latest_step()

    def purge(self):
        """Delete every checkpoint under this manager.

        Needed when an existing checkpoint is REFUSED (e.g. a mid-epoch
        checkpoint whose batch geometry no longer matches after an
        elastic mesh change): orbax silently skips saves at steps <= the
        latest existing step, so a refused-but-present checkpoint would
        silently disable all subsequent saves from the restarted run,
        whose global step restarts lower."""
        self.wait()
        for step in self.manager.all_steps():
            self.manager.delete(step)

    def all_steps(self):
        self.wait()
        return sorted(self.manager.all_steps())

    def close(self):
        self.manager.close()  # orbax waits for pending saves internally


def load_checkpoint(config, logger, template_state, params_only=False):
    """Returns (manager, restored_state_or_None, epoch_offset).

    ``params_only=True`` (decode/inference): restores just step/params/
    batch_stats via the validated partial restore, keeping the template's
    fresh optimizer state — so decoding a checkpoint never requires
    reproducing the training-time optimizer flags."""
    manager = CheckpointManager(
        config.path_ckpt, max_to_keep=config.model_ckpt_max_to_keep,
        use_async=getattr(config, "tpu_async_ckpt", False),
    )
    step = None
    if config.path_ckpt_epoch is not None and config.path_ckpt_epoch > 0:
        step = config.path_ckpt_epoch
    elif manager.latest_step() is not None:
        step = manager.latest_step()

    if step is None:
        logger.info("Loaded ckpt: None")
        return manager, None, 0
    if params_only:
        subset = {
            k: template_state[k]
            for k in ("step", "params", "batch_stats", "ema_params")
            if template_state.get(k) is not None
        }
        restored = dict(template_state)
        restored.update(manager.restore_partial(step, subset))
    else:
        restored = manager.restore(step, template_state)
    logger.info("Loaded ckpt: %s/%d%s", manager.path, step,
                " (params only)" if params_only else "")
    return manager, restored, int(step)


def average_checkpoints(ckpt_path, template_state, average_num, max_epoch=0,
                        logger=None):
    """Mean of the last ``average_num`` checkpoints' params/batch_stats.

    Respects the reference filter: with ``max_epoch > 0`` only checkpoints
    with step <= max_epoch participate (reference: average_ckpt_sr.py:92-96).
    Returns the averaged state (optimizer state taken from the last ckpt).
    """
    manager = CheckpointManager(ckpt_path)
    steps = manager.all_steps()
    if max_epoch and max_epoch > 0:
        steps = [s for s in steps if s <= max_epoch]
    steps = steps[-average_num:]
    if not steps:
        raise FileNotFoundError("no checkpoints under %s" % ckpt_path)
    if logger:
        logger.info("Averaging checkpoints: %s", steps)

    acc = None
    last = None
    # only the LAST checkpoint needs a full restore (its opt_state rides
    # the averaged tree); the others contribute params/batch_stats only,
    # so use the validated partial restore — deserializing N optimizer
    # states for nothing also re-couples this read-only consumer to the
    # training-time optimizer flags
    sub_template = {
        "params": template_state["params"],
        "batch_stats": template_state.get("batch_stats", {}),
    }
    for step in steps:
        if step == steps[-1]:
            # a dedicated manager: orbax registers ONE restore handler
            # per item name per manager, and the partial restores above
            # registered PyTreeRestore — mixing StandardRestore on the
            # same manager raises a handler mismatch
            full_mgr = CheckpointManager(ckpt_path)
            restored = full_mgr.restore(step, template_state)
            full_mgr.close()
            last = restored
        else:
            restored = manager.restore_partial(step, sub_template)
        avg_part = {"params": restored["params"],
                    "batch_stats": restored.get("batch_stats", {})}
        if acc is None:
            acc = jax.tree.map(lambda x: np.asarray(x, np.float64), avg_part)
        else:
            acc = jax.tree.map(
                lambda a, x: a + np.asarray(x, np.float64), acc, avg_part
            )
    n = float(len(steps))
    mean = jax.tree.map(lambda a: (a / n).astype(np.float32), acc)
    result = dict(last)
    result["params"] = mean["params"]
    result["batch_stats"] = mean["batch_stats"]
    manager.close()
    return result, steps
