"""Functional train state (params + optimizer state + BN statistics)."""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any

    @classmethod
    def create(cls, params, tx, batch_stats=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=batch_stats if batch_stats is not None else {},
        )


def param_count(params):
    return sum(int(x.size) for x in jax.tree.leaves(params))
