"""Transformer decoder blocks (API-completeness parity).

The reference ships (but its CTC trainers never wire) a DecoderBlock with
masked self-attention + cross-attention and an EncoderMFBlock multi-feature
variant (reference: tfsr/model/block.py:75-210). Ported here so an
attention-based decoder can be built on the same primitives.
"""

from typing import Optional

from flax import linen as nn

from srf_tpu.models.layers import MultiHeadAttention, PointWiseFeedForward


class EncoderMFBlock(nn.Module):
    """Multi-feature encoder block (reference: block.py:75-141): self-att on
    the feature stream, cross-att against a raw-feature stream, projected
    residual, FFN."""

    d_model: int
    num_heads: int
    dff: int
    inner_dropout: float
    residual_dropout: float
    attention_dropout: float
    init_name: Optional[str] = None

    @nn.compact
    def __call__(self, raw_emb, feat_emb, mask, attention_penalty_mask,
                 training: bool):
        from srf_tpu.models.initializers import get_init

        norm_feat = nn.LayerNorm(epsilon=1e-6, name="ln1")(feat_emb)
        if raw_emb is None:
            norm_raw = feat_emb
        else:
            norm_raw = nn.LayerNorm(epsilon=1e-6, name="ln_raw")(raw_emb)
        att_drop = self.attention_dropout if training else 0.0

        attn1, _ = MultiHeadAttention(
            self.d_model, self.num_heads, self.init_name, name="mha1"
        )(norm_feat, norm_feat, norm_feat, mask, att_drop,
          attention_penalty_mask, training)
        attn1 = nn.Dropout(
            rate=self.residual_dropout, deterministic=not training
        )(attn1)
        out1 = attn1 + feat_emb

        nout1 = nn.LayerNorm(epsilon=1e-6, name="ln2")(out1)
        attn2, _ = MultiHeadAttention(
            self.d_model, self.num_heads, self.init_name, name="mha2"
        )(norm_raw, norm_raw, nout1, mask, att_drop,
          attention_penalty_mask, training)
        attn2 = nn.Dropout(
            rate=self.residual_dropout, deterministic=not training
        )(attn2)
        out2 = nn.Dense(
            self.d_model, use_bias=False,
            kernel_init=get_init(self.init_name), name="proj",
        )(attn2) + out1

        nout2 = nn.LayerNorm(epsilon=1e-6, name="ln3")(out2)
        ffn_out = PointWiseFeedForward(
            self.d_model, self.dff, self.inner_dropout, self.init_name,
            name="ffn",
        )(nout2, training)
        ffn_out = nn.Dropout(
            rate=self.residual_dropout, deterministic=not training
        )(ffn_out)
        return ffn_out + out2


class DecoderBlock(nn.Module):
    d_model: int
    num_heads: int
    dff: int
    inner_dropout: float
    residual_dropout: float
    attention_dropout: float
    init_name: Optional[str] = None

    @nn.compact
    def __call__(self, cur_emb, pre_emb, enc_out, look_ahead_mask,
                 padding_mask, dec_att_pen, enc_dec_att_pen, training: bool):
        norm_cur = nn.LayerNorm(epsilon=1e-6, name="ln_cur")(cur_emb)
        if pre_emb is None:
            norm_pre = norm_cur
        else:
            norm_pre = nn.LayerNorm(epsilon=1e-6, name="ln_pre")(pre_emb)
        att_drop = self.attention_dropout if training else 0.0

        attn1, w1 = MultiHeadAttention(
            self.d_model, self.num_heads, self.init_name, name="mha1"
        )(norm_pre, norm_pre, norm_cur, look_ahead_mask, att_drop,
          dec_att_pen, training)
        attn1 = nn.Dropout(
            rate=self.residual_dropout, deterministic=not training
        )(attn1)
        out1 = attn1 + cur_emb

        nout1 = nn.LayerNorm(epsilon=1e-6, name="ln_com")(out1)
        attn2, w2 = MultiHeadAttention(
            self.d_model, self.num_heads, self.init_name, name="mha2"
        )(enc_out, enc_out, nout1, padding_mask, att_drop,
          enc_dec_att_pen, training)
        attn2 = nn.Dropout(
            rate=self.residual_dropout, deterministic=not training
        )(attn2)
        out2 = attn2 + out1

        nout2 = nn.LayerNorm(epsilon=1e-6, name="ln_res")(out2)
        ffn_out = PointWiseFeedForward(
            self.d_model, self.dff, self.inner_dropout, self.init_name,
            name="ffn",
        )(nout2, training)
        ffn_out = nn.Dropout(
            rate=self.residual_dropout, deterministic=not training
        )(ffn_out)
        return ffn_out + out2, w1, w2
