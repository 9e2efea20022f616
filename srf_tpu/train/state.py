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
    # EMA of params (--tpu-ema-decay); None keeps the pytree (and therefore
    # the checkpoint layout) identical to pre-EMA checkpoints
    ema_params: Any = None

    @classmethod
    def create(cls, params, tx, batch_stats=None, with_ema=False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=batch_stats if batch_stats is not None else {},
            # initialize at the params (not zeros), so no bias correction is
            # needed; a REAL copy — aliasing the param buffers would make
            # donation see the same buffer twice
            ema_params=(
                jax.tree.map(lambda x: jnp.array(x, copy=True), params)
                if with_ema else None
            ),
        )


def param_count(params):
    return sum(int(x.size) for x in jax.tree.leaves(params))
