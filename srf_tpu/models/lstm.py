"""(B)LSTM CTC encoder.

Reference: tfsr/model/lstm_encoder.py:31-103 — optional CNN front-end, N x
{ (B)LSTM(d_model) with 'ave' merge for blstm, LayerNorm(1e-6), dropout },
Dense(vocab, no bias), length-mask, final LayerNorm. The recurrence runs as
``nn.RNN``/``lax.scan`` over time; a bidirectional layer averages the two
directions like Keras ``merge_mode="ave"``
(reference: lstm_encoder.py:52-54).

Reference quirk preserved (like the CNN mask-divisor quirks in cnn.py):
the RNNs run WITHOUT ``seq_lengths`` — the backward direction of a BLSTM
consumes trailing zero-pad frames before the valid ones (zero inputs
still update the carry via the biases), so every valid frame's backward
state depends on the batch's padding amount. The reference has the
identical flaw (Keras ``Masking`` is applied only AFTER the LSTMs,
lstm_encoder.py:68-75), and the per-parameter gradient-parity tests
require matching it; passing ``seq_lengths=`` to ``nn.RNN`` would be the
one-line fix if parity is ever dropped.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from srf_tpu.models.initializers import get_init
from srf_tpu.models.layers import ConvFrontEnd
from srf_tpu.ops.masking import feat_mask2


class LstmEncoder(nn.Module):
    num_layers: int
    d_model: int
    vocab_n: int
    feat_dim: int
    bidirectional: bool = False
    merge_mode: str = "ave"
    input_dropout: float = 0.1
    inner_dropout: float = 0.1
    init_name: Optional[str] = None
    is_cnnfe: bool = False
    conv_layer_num: int = 2
    conv_filter_num: int = 64
    conv_stride: int = 2

    @classmethod
    def from_config(cls, config, vocab_n, **overrides):
        kwargs = dict(
            num_layers=config.model_encoder_num,
            d_model=config.model_dimension,
            vocab_n=vocab_n,
            feat_dim=config.feat_dim,
            bidirectional=config.model_type.lower() == "blstm",
            merge_mode=config.model_lstm_merge,
            input_dropout=config.train_inp_dropout,
            inner_dropout=config.train_inn_dropout,
            init_name=config.model_initializer,
            is_cnnfe=config.model_lstm_is_cnnfe,
            conv_layer_num=config.model_conv_layer_num,
            conv_filter_num=config.model_conv_filter_num,
            conv_stride=config.model_conv_stride,
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @property
    def in_len_div(self):
        return self.conv_stride**self.conv_layer_num if self.is_cnnfe else 1

    def _merge(self, fwd, bwd):
        if self.merge_mode == "ave":
            return (fwd + bwd) * 0.5
        if self.merge_mode == "sum":
            return fwd + bwd
        if self.merge_mode == "mul":
            return fwd * bwd
        return jnp.concatenate([fwd, bwd], axis=-1)

    @nn.compact
    def __call__(self, feats, input_lengths, training: bool):
        x = feats
        if self.is_cnnfe:
            x = ConvFrontEnd(
                cnn_n=self.conv_layer_num,
                nfilt=self.conv_filter_num,
                stride=self.conv_stride,
                init_name=self.init_name,
                name="conv_feat",
            )(x, input_lengths, training)
            batch, seq_len = x.shape[0], x.shape[1]
            x = x.reshape(batch, seq_len, -1)

        x = nn.Dropout(rate=self.input_dropout, deterministic=not training)(x)
        kernel_init = get_init(self.init_name)

        for idx in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(
                self.d_model, kernel_init=kernel_init, name="lstm%d_f" % idx
            )
            fwd = nn.RNN(cell, time_major=False)(x)
            if self.bidirectional:
                bcell = nn.OptimizedLSTMCell(
                    self.d_model, kernel_init=kernel_init, name="lstm%d_b" % idx
                )
                bwd = nn.RNN(bcell, time_major=False, reverse=True,
                             keep_order=True)(x)
                x = self._merge(fwd, bwd)
            else:
                x = fwd
            x = nn.LayerNorm(epsilon=1e-6, name="ln%d" % idx)(x)
            x = nn.Dropout(rate=self.inner_dropout, deterministic=not training)(x)

        x = nn.Dense(
            self.vocab_n, use_bias=False, kernel_init=kernel_init, name="proj"
        )(x)
        x = feat_mask2(x, input_lengths, self.in_len_div)
        return nn.LayerNorm(epsilon=1e-6, name="ln_out")(x)
