"""Speech-Transformer attention distance penalty.

The reference precomputes a [num_head, 2500, 2500] "penalty board" by
accumulating band-part complements: position pairs with distance d collect
one unit of penalty for every stripe width i in
``range(zero_width - 1, max_len, stripe_width)`` with ``d > i``, scaled by
``scale`` (reference: tfsr/helper/model_helper.py:189-264; applied inside
attention as ``scores += -log(1 + penalty)``, tfsr/model/attention.py:79-80).

That count has the closed form ``ceil((d - zero_width + 1) / stripe_width)``
clipped at 0 (and bounded by the number of stripes), so the penalty slice for
any length is computed analytically — no 100 MB host board, no slicing, and
the same values to float precision. The penalty is identical across heads, so
a broadcastable [1, L, L] slice is returned.
"""

import jax.numpy as jnp
import numpy as np


class AttentionPenalty:
    def __init__(self, max_len, num_head, zero_width, stripe_width, scale):
        self.max_len = max_len
        self.num_head = num_head
        self.zero_width = zero_width
        self.stripe_width = stripe_width
        self.scale = scale
        # number of stripes the reference accumulates
        self.n_stripes = len(range(zero_width - 1, max_len, stripe_width))

    def penalty(self, length):
        """[1, L, L] penalty values for sequences of ``length``."""
        d = np.abs(np.arange(length)[:, None] - np.arange(length)[None, :])
        count = np.ceil((d - self.zero_width + 1) / self.stripe_width)
        count = np.clip(count, 0, self.n_stripes)
        return jnp.asarray((count * self.scale)[None].astype(np.float32))

    def create_eap(self, max_frames):
        return self.penalty(int(max_frames))


def create_attention_penalty(config, logger):
    """Build the penalty helper when configured (reference gate:
    model_helper.py:189-216)."""
    if (
        (config.model_ap_encoder or config.model_ap_decoder or config.model_ap_encdec)
        and config.model_ap_width_zero is not None and config.model_ap_width_zero > 0
        and config.model_ap_width_stripe is not None and config.model_ap_width_stripe > 0
        and config.model_ap_scale is not None and config.model_ap_scale > 0.0
    ):
        att_pen = AttentionPenalty(
            max_len=2500,
            num_head=config.model_att_head_num,
            zero_width=config.model_ap_width_zero,
            stripe_width=config.model_ap_width_stripe,
            scale=config.model_ap_scale,
        )
        logger.info(
            "Attention penalty: zero width %d, stripe width %d, scale %f",
            config.model_ap_width_zero, config.model_ap_width_stripe,
            config.model_ap_scale,
        )
    else:
        att_pen = None
        logger.info("Attention penalties will not be applied.")
    return att_pen
