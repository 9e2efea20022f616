"""Optimizer and LR schedule.

Reference parity (tfsr/helper/train_helper.py:32-75):
- ``CustomSchedule``: the Speech-Transformer/Noam schedule
  ``lr = min(k * rsqrt(d_model) * min(rsqrt(step), step * warmup^-1.5),
  max_lr)``,
- ``get_optimizer``: default Adam(CustomSchedule, beta/epsilon flags);
  ``--train-opti-type=adam`` -> plain Adam(lr=k); ``sgd`` -> SGD(lr=k).
"""

import jax.numpy as jnp
import optax


def noam_schedule(train_lr_param_k, d_model, warmup_steps, max_lr=10.0):
    def schedule(step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1e-9)
        arg1 = step**-0.5
        arg2 = step * (warmup_steps**-1.5)
        lr = train_lr_param_k * (float(d_model) ** -0.5) * jnp.minimum(arg1, arg2)
        return jnp.minimum(lr, max_lr)

    return schedule


def get_optimizer(config):
    """Returns (optax optimizer, schedule_fn or None)."""
    opti_type = config.train_opti_type
    if opti_type is None or opti_type not in ("adam", "sgd"):
        schedule = noam_schedule(
            config.train_lr_param_k,
            config.model_dimension,
            config.train_warmup_n,
            config.train_lr_max,
        )
        tx = optax.adam(
            learning_rate=schedule,
            b1=config.train_adam_beta1,
            b2=config.train_adam_beta2,
            eps=config.train_adam_epsilon,
        )
        return tx, schedule
    if opti_type == "adam":
        return optax.adam(learning_rate=config.train_lr_param_k), None
    return optax.sgd(learning_rate=config.train_lr_param_k), None
