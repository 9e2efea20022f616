"""CLI: average the last N checkpoints into ``$ckpt/avg``.

Reference parity: tfsr/utils/average_ckpt_sr.py / average_ckpt_tf.py — same
flags as the trainers, averages the last ``--model-average-num`` checkpoints
(filtered to step <= --train-max-epoch when > 0) and writes ``$ckpt/avg``.
With pytree checkpoints this is a tree-map mean; no model rebuilds.

Usage (either trainer family):
    python -m srf_tpu.tools.average_ckpt --config=... --path-ckpt=... \
        --model-average-num=10
"""

import sys

import jax

from srf_tpu.config import Logger, ParseOption
from srf_tpu.train.optimizer import get_optimizer
from srf_tpu.utils.checkpoint import CheckpointManager, average_checkpoints
from srf_tpu.utils.vocab import get_file_path, load_vocab


def main(argv=None):
    logger = Logger(name="average_ckpt", level=Logger.DEBUG).logger
    config = ParseOption(argv or sys.argv, logger).args

    _, _, dec_in_dim, _ = load_vocab(
        get_file_path(config.path_base, config.path_vocab), logger
    )
    dec_out_dim = dec_in_dim + 1
    logger.info("The modified output Dimension %d", dec_out_dim)

    tx, _ = get_optimizer(config)
    rng = jax.random.PRNGKey(config.tpu_seed)

    if not config.model_average_num or config.model_average_num < 1:
        raise SystemExit(
            "--model-average-num must be a positive checkpoint count "
            "(got %r)" % (config.model_average_num,)
        )

    if (config.model_type or "srf").lower() == "stf":
        from srf_tpu.models.registry import stf_in_len_div
        from srf_tpu.models.stf import ConvEncoder
        from srf_tpu.trainer_sr import state_to_tree
        from srf_tpu.trainer_tf import stf_state_template

        model = ConvEncoder.from_config(config, dec_out_dim)
        template = state_to_tree(stf_state_template(
            model, config, tx, rng, stf_in_len_div(config, logger)
        ))
    else:
        from srf_tpu.models.registry import build_model
        from srf_tpu.trainer_sr import state_template, state_to_tree

        model, _ = build_model(config, dec_out_dim, logger)
        template = state_to_tree(state_template(model, config, tx, rng))

    avg_state, steps = average_checkpoints(
        config.path_ckpt, template, config.model_average_num,
        max_epoch=config.train_max_epoch or 0, logger=logger,
    )
    logger.info("Total %d checkpoints were averaged.", len(steps))

    manager = CheckpointManager(config.path_ckpt + "/avg", max_to_keep=1)
    path = manager.save(1, avg_state)
    manager.close()
    logger.info("Saved to %s", path)


if __name__ == "__main__":
    main()
