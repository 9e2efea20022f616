"""Sinusoidal positional encoding.

Same formulation as the reference (reference: tfsr/helper/model_helper.py:
30-58, itself the official-transformer layout: [sin(all timescales) ||
cos(all timescales)], not interleaved). Computed in float32.
"""

import math

import jax.numpy as jnp


def get_pos_enc(length, hidden_size, min_timescale=1.0, max_timescale=1.0e4):
    position = jnp.arange(length, dtype=jnp.float32)
    num_timescales = hidden_size // 2
    log_timescale_increment = math.log(float(max_timescale) / float(min_timescale)) / (
        float(num_timescales) - 1
    )
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32) * -log_timescale_increment
    )
    scaled_time = position[:, None] * inv_timescales[None, :]
    return jnp.concatenate([jnp.sin(scaled_time), jnp.cos(scaled_time)], axis=1)
