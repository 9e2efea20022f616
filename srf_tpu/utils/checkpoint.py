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
    def __init__(self, path, max_to_keep=None):
        if max_to_keep is not None and max_to_keep < 0:
            max_to_keep = None
        self.path = _abs(path)
        os.makedirs(self.path, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
        )
        self.manager = ocp.CheckpointManager(self.path, options=options)

    def save(self, step, state_dict):
        self.manager.save(step, args=ocp.args.StandardSave(state_dict))
        self.manager.wait_until_finished()
        return os.path.join(self.path, str(step))

    def restore(self, step, template):
        return self.manager.restore(step, args=ocp.args.StandardRestore(template))

    def restore_partial(self, step, template):
        """Restore only the subtree present in ``template``.

        Inference needs params (+ batch_stats) but not the optimizer
        state, whose pytree structure depends on the training flags —
        partial restore frees serving/decoding from having to reproduce
        the exact optimizer configuration the checkpoint was trained
        with."""
        return self.manager.restore(
            step,
            args=ocp.args.PyTreeRestore(item=template, partial_restore=True),
        )

    def latest_step(self):
        return self.manager.latest_step()

    def all_steps(self):
        return sorted(self.manager.all_steps())

    def close(self):
        self.manager.close()


def load_checkpoint(config, logger, template_state):
    """Returns (manager, restored_state_or_None, epoch_offset)."""
    manager = CheckpointManager(
        config.path_ckpt, max_to_keep=config.model_ckpt_max_to_keep
    )
    step = None
    if config.path_ckpt_epoch is not None and config.path_ckpt_epoch > 0:
        step = config.path_ckpt_epoch
    elif manager.latest_step() is not None:
        step = manager.latest_step()

    if step is None:
        logger.info("Loaded ckpt: None")
        return manager, None, 0
    restored = manager.restore(step, template_state)
    logger.info("Loaded ckpt: %s/%d", manager.path, step)
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
    for step in steps:
        restored = manager.restore(step, template_state)
        last = restored
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
