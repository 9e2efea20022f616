"""Speech-Transformer CTC encoder ("STF").

Reference: the ``ConvEncoder`` defined inside tfsr/trainer_tf.py:39-118 —
CNN front-end -> reshape -> Dense(d_model) -> length mask -> * sqrt(d_model)
+ positional encoding -> input dropout -> N x pre-LN EncoderBlock ->
LayerNorm -> Dense(vocab). The attention mask is the padding bias
(reference: tfsr/helper/model_helper.py:79-98) and the optional distance
penalty board is computed analytically in ops/attention_penalty.py.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from srf_tpu.models.initializers import get_init
from srf_tpu.models.layers import ConvFrontEnd, EncoderBlock
from srf_tpu.ops.masking import feat_mask2
from srf_tpu.ops.pos_enc import get_pos_enc


class ConvEncoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    dff: int
    feat_dim: int
    vocab_n: int
    input_dropout: float = 0.1
    inner_dropout: float = 0.1
    residual_dropout: float = 0.1
    attention_dropout: float = 0.1
    nfilt: int = 64
    cnn_n: int = 2
    init_name: Optional[str] = None
    stride: int = 2
    # "auto" picks the attention path from measurements on v5e
    # (BENCH_NOTES.md r2): plain wins train time up to the reference's
    # frame-budget shapes, blockwise wins eval at T' >= ~2048 and is the
    # only path that FITS when the [B, H, T, T] weights exceed ~600MB per
    # layer (plain fails to compile at T'=2500, batch 8). "plain" always
    # materializes the weights; "blockwise" always streams
    # (ops/blockwise_attention.py).
    # "ring" shards the time axis over mesh[seq_axis] (sequence
    # parallelism, ops/ring_attention.py) — requires ``mesh``; no
    # attention dropout.
    attention_impl: str = "auto"
    auto_blockwise_len: int = 2048
    # closed-form distance-penalty params (zero_width, stripe_width,
    # scale, n_stripes) used by the blockwise path in place of the dense
    # attention_penalty_mask board
    penalty_params: Optional[tuple] = None
    mesh: Optional[object] = None  # jax Mesh for the ring path
    seq_axis: str = "seq"

    @classmethod
    def from_config(cls, config, vocab_n, **overrides):
        penalty_params = None
        # same gate as ops/attention_penalty.create_attention_penalty (any
        # of the three ap flags): the plain path receives the dense board
        # whenever the helper exists, so the blockwise/ring closed form
        # must exist under the same condition or kernels would diverge
        if (
            (config.model_ap_encoder or config.model_ap_decoder
             or config.model_ap_encdec)
            and config.model_ap_width_zero and config.model_ap_width_zero > 0
            and config.model_ap_width_stripe
            and config.model_ap_width_stripe > 0
            and config.model_ap_scale and config.model_ap_scale > 0.0
        ):
            from srf_tpu.ops.blockwise_attention import PenaltyParams

            n_stripes = len(range(config.model_ap_width_zero - 1, 2500,
                                  config.model_ap_width_stripe))
            penalty_params = PenaltyParams(
                config.model_ap_width_zero, config.model_ap_width_stripe,
                config.model_ap_scale, n_stripes,
            )
        kwargs = dict(
            num_layers=config.model_encoder_num,
            d_model=config.model_dimension,
            num_heads=config.model_att_head_num,
            dff=config.model_inner_dim,
            feat_dim=config.feat_dim,
            vocab_n=vocab_n,
            input_dropout=config.train_inp_dropout,
            inner_dropout=config.train_inn_dropout,
            residual_dropout=config.train_res_dropout,
            attention_dropout=config.train_att_dropout,
            nfilt=config.model_conv_filter_num,
            cnn_n=config.model_conv_layer_num,
            init_name=config.model_initializer,
            penalty_params=penalty_params,
            attention_impl=getattr(config, "tpu_attention_kernel", "auto"),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, feats, input_lengths=None, training: bool = False,
                 mask=None, attention_penalty_mask=None, in_len_div=4, *,
                 stage="all"):
        """``stage`` partitions the forward for pipeline parallelism
        (parallel/pipeline.py): "embed" runs the front-end and returns
        ``(embeddings, impl)``; "head" treats ``feats`` as block outputs
        and runs the final LayerNorm+Dense; "all" (default) is the whole
        forward, unchanged. Parameter names are identical in every stage
        (flax scopes by explicit ``name=``), so one ``variables`` tree
        serves all three entry points."""
        if stage not in ("all", "embed", "head"):
            raise ValueError(
                "unknown stage %r (expected 'all', 'embed' or 'head'); a "
                "typo here would silently run the head on raw features"
                % (stage,)
            )
        if stage in ("all", "embed"):
            out = ConvFrontEnd(
                cnn_n=self.cnn_n,
                nfilt=self.nfilt,
                stride=self.stride,
                init_name=self.init_name,
                name="conv",
            )(feats, input_lengths, training)
            batch, seq_len = out.shape[0], out.shape[1]
            out = out.reshape(batch, seq_len, -1)
            out = nn.Dense(
                self.d_model, kernel_init=get_init(self.init_name),
                name="linear_projection",
            )(out)
            embeddings = feat_mask2(out, input_lengths, in_len_div)

            embeddings = embeddings * jnp.sqrt(float(self.d_model))
            embeddings = embeddings + get_pos_enc(seq_len, self.d_model)
            embeddings = nn.Dropout(
                rate=self.input_dropout, deterministic=not training
            )(embeddings)

            impl = self.attention_impl
            if impl == "auto":
                att_weight_bytes = (
                    4.0 * batch * self.num_heads * seq_len * seq_len
                )
                if training:
                    impl = "blockwise" if att_weight_bytes > 6e8 else "plain"
                else:
                    impl = (
                        "blockwise" if seq_len >= self.auto_blockwise_len
                        else "plain"
                    )
            if stage == "embed":
                return embeddings, impl
        else:  # "head": ``feats`` already holds the block-stack outputs
            embeddings, impl = feats, None

        if stage == "all":
            if impl in ("blockwise", "ring"):
                # the dense penalty board is the plain path's input;
                # blockwise/ring recompute the same values per tile from
                # penalty_params
                attention_penalty_mask = None
            for i in range(self.num_layers):
                embeddings = EncoderBlock(
                    self.d_model, self.num_heads, self.dff,
                    self.inner_dropout, self.residual_dropout,
                    self.attention_dropout, self.init_name,
                    name="enc%d" % i, attention_impl=impl,
                    penalty_params=self.penalty_params,
                    mesh=self.mesh, seq_axis=self.seq_axis,
                )(embeddings, mask, attention_penalty_mask, training)

        embeddings = nn.LayerNorm(epsilon=1e-6, name="ln")(embeddings)
        return nn.Dense(self.vocab_n, name="proj")(embeddings)
