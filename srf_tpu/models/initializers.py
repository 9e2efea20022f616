"""Weight initializers matching the reference registry.

Reference: tfsr/helper/model_helper.py:156-164 — ``fan_avg`` is
VarianceScaling(1.0, fan_avg, uniform), ``uniform`` is RandomUniform(±0.05),
anything else falls back to glorot_uniform. Unlike the reference (seed=None),
all randomness here flows from explicit PRNG keys.
"""

import jax
from flax import linen as nn

from srf_tpu.config.constants import Constants


def _uniform_pm(scale):
    def init(key, shape, dtype=jax.numpy.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init


def get_init(init_name):
    if init_name == Constants.INIT_FANAVG:
        return nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
    if init_name == Constants.INIT_UNIFORM:
        return _uniform_pm(0.05)
    return nn.initializers.glorot_uniform()


def routing_weight_init(stddev=0.1):
    """Routing transformation matrices: normal(0, 0.1)
    (reference: sequence_router_naive.py:97-103)."""
    return nn.initializers.normal(stddev=stddev)
