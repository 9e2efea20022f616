"""Shared model building blocks (flax.linen).

- :class:`ConvFrontEnd` — the reference's "CapsulationLayer" CNN front-end:
  per layer two parallel stride-2 3x3 convs combined by maxout, each with
  dropout 0.2, then length-mask -> BatchNorm -> length-mask
  (reference: tfsr/model/sequence_router.py:44-82). BatchNorm statistics are
  computed over the zero-masked padded frames exactly like Keras BN after
  the mask layer (mask -> BN -> mask ordering matters for parity).
- :class:`MultiHeadAttention` — QKV dense (no bias), scaled dot-product with
  additive ``mask * -1e9`` and the Speech-Transformer distance penalty
  ``+= -log(1 + penalty)`` (reference: tfsr/model/attention.py:34-174).
- :class:`PointWiseFeedForward` (reference: tfsr/model/feed_forward.py:26-40).
- :class:`EncoderBlock` — pre-LN transformer block
  (reference: tfsr/model/block.py:32-72).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from srf_tpu.models.initializers import get_init
from srf_tpu.ops.masking import feat_mask


class ConvFrontEnd(nn.Module):
    """Maxout conv subsampler; output [B, ceil(T/stride^n), F', nfilt]."""

    cnn_n: int
    nfilt: int
    kernel_size: int = 3
    stride: int = 2
    init_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, input_lengths, training: bool):
        x = inputs[..., None]  # [B, T, F, 1]
        kernel_init = get_init(self.init_name)
        for conv_idx in range(self.cnn_n):
            branches = []
            for branch in range(2):
                conv = nn.Conv(
                    features=self.nfilt,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding="SAME",
                    kernel_init=kernel_init,
                    name="conv%d_%d" % (conv_idx, branch),
                )(x)
                conv = nn.Dropout(rate=0.2, deterministic=not training)(conv)
                branches.append(conv)
            x = jnp.maximum(branches[0], branches[1])
            divisor = self.stride ** (conv_idx + 1)
            x = feat_mask(x, input_lengths, divisor)
            x = nn.BatchNorm(
                use_running_average=not training,
                momentum=0.99,
                epsilon=1e-3,
                name="bn%d" % conv_idx,
            )(x)
            x = feat_mask(x, input_lengths, divisor)
        return x


def scaled_dot_product_attention(query, key, value, mask, attention_dropout,
                                 att_pen_mask, dropout_module=None):
    """Attention(Q,K,V) with additive -1e9 masking and distance penalty."""
    matmul_qk = jnp.einsum(
        "...qd,...kd->...qk", query, key, preferred_element_type=jnp.float32
    )
    depth = query.shape[-1]
    scaled = matmul_qk / jnp.sqrt(jnp.asarray(depth, matmul_qk.dtype))
    if att_pen_mask is not None:
        scaled = scaled + jnp.log1p(att_pen_mask) * -1.0
    if mask is not None:
        scaled = scaled + mask * -1e9
    weights = nn.softmax(scaled, axis=-1)
    if dropout_module is not None and attention_dropout > 0:
        weights = dropout_module(weights)
    output = jnp.einsum(
        "...qk,...kd->...qd", weights, value, preferred_element_type=jnp.float32
    )
    return output, weights


class MultiHeadAttention(nn.Module):
    """QKV projections + attention.

    ``impl="plain"`` materializes the [B, H, T, T] weights (reference
    semantics, returns the weights for plotting); ``impl="blockwise"``
    runs the flash-style online-softmax path
    (ops/blockwise_attention.py) with the closed-form distance penalty
    ``penalty_params`` — O(T*block) memory, returns weights=None;
    ``impl="ring"`` shards the time axis over ``mesh[seq_axis]`` and
    rotates K/V via ppermute (ops/ring_attention.py) — O(T^2/n) per-chip
    attention memory, no dropout support, returns weights=None.
    """

    d_model: int
    num_heads: int
    init_name: Optional[str] = None
    impl: str = "plain"  # plain | blockwise | ring
    penalty_params: Optional[tuple] = None
    mesh: Optional[object] = None  # jax Mesh (ring path)
    seq_axis: str = "seq"
    batch_axis: Optional[str] = None  # ring: shard batch too (dp x sp)

    @nn.compact
    def __call__(self, value, key, query, mask, attention_dropout, att_pen_mask,
                 training: bool):
        assert self.d_model % self.num_heads == 0
        depth = self.d_model // self.num_heads
        batch = query.shape[0]
        kernel_init = get_init(self.init_name)

        def _dense(name, x, use_bias):
            return nn.Dense(
                self.d_model, use_bias=use_bias, kernel_init=kernel_init, name=name
            )(x)

        def _split(x):
            x = x.reshape(batch, -1, self.num_heads, depth)
            return jnp.transpose(x, (0, 2, 1, 3))

        q = _split(_dense("wq", query, False))
        k = _split(_dense("wk", key, False))
        v = _split(_dense("wv", value, False))

        if self.impl == "blockwise":
            from srf_tpu.ops.blockwise_attention import blockwise_attention

            rng = (
                self.make_rng("dropout")
                if (training and attention_dropout > 0) else None
            )
            attended = blockwise_attention(
                q, k, v, mask, penalty=self.penalty_params,
                dropout_rate=attention_dropout if training else 0.0,
                dropout_rng=rng,
            )
            weights = None
        elif self.impl == "ring":
            from srf_tpu.ops.ring_attention import ring_attention

            if training and attention_dropout > 0:
                raise ValueError(
                    "ring attention does not support attention dropout; "
                    "train with --tpu-attention-kernel=blockwise or set "
                    "attention dropout to 0"
                )
            if self.mesh is None:
                raise ValueError(
                    "attention_impl='ring' requires mesh= (a jax Mesh "
                    "whose '%s' axis shards the time dimension)"
                    % self.seq_axis
                )
            # on a dp x sp mesh, also shard the batch over the data axis:
            # without it shard_map's replicated batch spec makes every
            # data-parallel group compute the FULL global batch's ring
            ba = self.batch_axis
            if ba is None and dict(self.mesh.shape).get("data", 1) > 1:
                ba = "data"
            attended = ring_attention(
                q, k, v, self.mesh, mask=mask, penalty=self.penalty_params,
                axis_name=self.seq_axis, batch_axis=ba,
            )
            weights = None
        else:
            drop = None
            if attention_dropout > 0:
                dropout = nn.Dropout(rate=attention_dropout,
                                     deterministic=not training)
                drop = dropout
            attended, weights = scaled_dot_product_attention(
                q, k, v, mask, attention_dropout, att_pen_mask, drop
            )
        attended = jnp.transpose(attended, (0, 2, 1, 3)).reshape(
            batch, -1, self.d_model
        )
        out = _dense("wo", attended, True)
        return out, weights


class PointWiseFeedForward(nn.Module):
    d_model: int
    dff: int
    ff_dropout: float
    init_name: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, training: bool):
        kernel_init = get_init(self.init_name)
        x = nn.Dense(self.dff, kernel_init=kernel_init, name="ff1")(inputs)
        x = nn.relu(x)
        x = nn.Dropout(rate=self.ff_dropout, deterministic=not training)(x)
        return nn.Dense(self.d_model, kernel_init=kernel_init, name="ff2")(x)


class EncoderBlock(nn.Module):
    d_model: int
    num_heads: int
    dff: int
    inner_dropout: float
    residual_dropout: float
    attention_dropout: float
    init_name: Optional[str] = None
    attention_impl: str = "plain"
    penalty_params: Optional[tuple] = None
    mesh: Optional[object] = None
    seq_axis: str = "seq"

    @nn.compact
    def __call__(self, inputs, mask, att_pen_mask, training: bool):
        emb = nn.LayerNorm(epsilon=1e-6, name="ln_cur")(inputs)
        att_drop = self.attention_dropout if training else 0.0
        attn_out, _ = MultiHeadAttention(
            self.d_model, self.num_heads, self.init_name, name="mha",
            impl=self.attention_impl, penalty_params=self.penalty_params,
            mesh=self.mesh, seq_axis=self.seq_axis,
        )(emb, emb, emb, mask, att_drop, att_pen_mask, training)
        attn_out = nn.Dropout(
            rate=self.residual_dropout, deterministic=not training
        )(attn_out)
        out1 = inputs + attn_out

        nout1 = nn.LayerNorm(epsilon=1e-6, name="ln_res")(out1)
        ffn_out = PointWiseFeedForward(
            self.d_model, self.dff, self.inner_dropout, self.init_name, name="ffn"
        )(nout1, training)
        ffn_out = nn.Dropout(
            rate=self.residual_dropout, deterministic=not training
        )(ffn_out)
        return out1 + ffn_out
