"""Capsule nonlinearities.

Exact math of the reference (reference: tfsr/model/sequence_router.py:29-41):
    squash(s) = (|s|^2 / (1 + |s|^2)) * s / sqrt(|s|^2 + eps),  eps = 1e-7
    length(s) = sqrt(sum(s^2) + eps)
"""

import jax.numpy as jnp


def squash(s, axis=-1, epsilon=1e-7):
    squared_norm = jnp.sum(jnp.square(s), axis=axis, keepdims=True)
    safe_norm = jnp.sqrt(squared_norm + epsilon)
    squash_factor = squared_norm / (1.0 + squared_norm)
    return squash_factor * (s / safe_norm)


def capsule_length(s, axis=-1, epsilon=1e-7, keepdims=False):
    squared_norm = jnp.sum(jnp.square(s), axis=axis, keepdims=keepdims)
    return jnp.sqrt(squared_norm + epsilon)
