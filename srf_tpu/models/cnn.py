"""Deep maxout CNN CTC encoders (Zhang et al. 2016, arXiv:1701.02720).

Two variants, matching the reference dispatch on ``--model-conv-is-mp``
(reference: tfsr/trainer_sr.py:180-185):

- :class:`CNNEncoder` (maxpool variant, reference: tfsr/model/cnn_encoder.py
  :34-182): (5,3) convs with channel-halving maxout, time stride on the
  first ``conv_layer_num`` layers, freq MaxPool(1,3) after layer 0, then
  maxout projection Dense stack and a final Dense(2*vocab) maxout.
- :class:`CNNStrideEncoder` (reference: tfsr/model/cnn_stride_encoder.py:
  36-184): the same body fed by the shared ConvFrontEnd subsampler.

Reference quirks preserved: the length-mask divisor is ``stride`` then
``stride*stride`` for the maxpool variant (cnn_encoder.py:159-162) and
``cnn_n ** stride`` for the stride variant (cnn_stride_encoder.py:165) —
both equal the true 4x subsampling only for the default stride=2, cnn_n=2.
"""

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from srf_tpu.models.initializers import get_init
from srf_tpu.models.layers import ConvFrontEnd
from srf_tpu.ops.dropout_pallas import fused_dropout
from srf_tpu.ops.masking import feat_mask, feat_mask2


def _channel_maxout(x):
    dim = x.shape[-1] // 2
    return jnp.maximum(x[..., :dim], x[..., dim:])


class _MaxoutConvStack(nn.Module):
    """Shared conv + projection body of both CNN variants."""

    layer_filters: tuple  # per-layer (filters, time_stride)
    proj_layers: int
    proj_dim: int
    class_n: int
    flat_dim: int  # features per frame after reshape
    mask_div_fn: Callable  # idx -> divisor
    inner_dropout: float
    init_name: Optional[str]
    pool_after_first: bool = False
    dropout_impl: str = "xla"

    def _drop(self, emb, rate, training):
        """One dropout site. ``xla`` = flax nn.Dropout (threefry mask,
        reference-default stream). ``pallas`` = the fused hardware-PRNG
        kernel (ops/dropout_pallas.py): mask generated inside the apply
        pass and REGENERATED in the backward pass — no mask residual.
        The CNN step is regularization-traffic-bound (BENCH_NOTES
        "Dense-family MFU": 13 train-mode masks), which is why the CNN
        body is where the kernel is wired."""
        if self.dropout_impl == "pallas":
            if not training or rate <= 0.0:
                return emb
            seed = jax.random.bits(self.make_rng("dropout"), (), jnp.uint32)
            return fused_dropout(emb, seed, rate)
        return nn.Dropout(rate=rate, deterministic=not training)(emb)

    @nn.compact
    def __call__(self, emb, input_lengths, training: bool):
        kernel_init = get_init(self.init_name)
        for idx, (filters, t_stride) in enumerate(self.layer_filters):
            emb = nn.Conv(
                features=filters,
                kernel_size=(5, 3),
                strides=(t_stride, 1),
                padding="SAME",
                use_bias=False,
                kernel_init=kernel_init,
                name="conv%d" % idx,
            )(emb)
            emb = self._drop(emb, 0.2, training)
            emb = _channel_maxout(emb)
            if self.pool_after_first and idx == 0:
                emb = nn.max_pool(emb, window_shape=(1, 3), strides=(1, 3))
            emb = nn.LayerNorm(epsilon=1e-6, name="ln%d" % idx)(emb)
            emb = self._drop(emb, self.inner_dropout, training)
            emb = feat_mask(emb, input_lengths, self.mask_div_fn(idx))

        batch, seq_len = emb.shape[0], emb.shape[1]
        emb = emb.reshape(batch, seq_len, self.flat_dim)

        for idx in range(self.proj_layers - 1):
            emb = nn.Dense(
                self.proj_dim, use_bias=False, kernel_init=kernel_init,
                name="proj%d" % idx,
            )(emb)
            emb = self._drop(emb, 0.2, training)
            half = emb.shape[-1] // 2
            emb = nn.LayerNorm(epsilon=1e-6, name="proj_ln%d" % idx)(
                jnp.maximum(emb[..., :half], emb[..., half:])
            )
            emb = self._drop(emb, self.inner_dropout, training)
            emb = feat_mask2(emb, input_lengths, self.mask_div_fn(1))

        emb = nn.Dense(
            self.class_n * 2, use_bias=False, kernel_init=kernel_init,
            name="projv",
        )(emb)
        emb = self._drop(emb, self.inner_dropout, training)
        half = emb.shape[-1] // 2
        emb = nn.LayerNorm(epsilon=1e-6, name="projv_ln")(
            jnp.maximum(emb[..., :half], emb[..., half:])
        )
        return feat_mask2(emb, input_lengths, self.mask_div_fn(1))


class CNNEncoder(nn.Module):
    """Maxpool variant (``--model-conv-is-mp=True``)."""

    enc_num: int
    class_n: int
    feat_dim: int
    nfilt_inp: int = 64
    nfilt_inn: int = 128
    proj_layers: int = 3
    proj_dim: int = 512
    conv_layer_num: int = 2
    stride: int = 2
    inner_dropout: float = 0.1
    init_name: Optional[str] = None
    dropout_impl: str = "xla"

    @classmethod
    def from_config(cls, config, class_n, **overrides):
        kwargs = dict(
            enc_num=config.model_encoder_num,
            class_n=class_n,
            feat_dim=config.feat_dim,
            nfilt_inp=config.model_conv_inp_nfilt,
            nfilt_inn=config.model_conv_inn_nfilt,
            proj_layers=config.model_conv_proj_num,
            proj_dim=config.model_conv_proj_dim,
            conv_layer_num=config.model_conv_layer_num,
            stride=config.model_conv_stride,
            inner_dropout=config.train_inn_dropout,
            init_name=config.model_initializer,
            dropout_impl=getattr(config, "tpu_dropout_kernel", "xla"),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, feats, input_lengths, training: bool):
        assert self.conv_layer_num < 4
        if self.enc_num < 5:
            # the reference architecture has 4 fixed input convs + a
            # final projection conv; fewer layers crash the reference's
            # own reshape — fail loudly instead of silently building 5
            raise ValueError(
                "the maxout CNN needs --model-encoder-num >= 5 "
                "(got %d)" % self.enc_num)
        pooled_dim = self.feat_dim // 3
        last_filt = (self.proj_dim // pooled_dim) * 2
        layer_filters = []
        for i in range(self.conv_layer_num):
            layer_filters.append((self.nfilt_inp, self.stride))
        for i in range(4 - self.conv_layer_num):
            layer_filters.append((self.nfilt_inp, 1))
        for i in range(4, self.enc_num - 1):
            layer_filters.append((self.nfilt_inn, 1))
        layer_filters.append((last_filt, 1))

        stride = self.stride

        def mask_div(idx):
            return stride if idx == 0 else stride * stride

        emb = feats[..., None]
        return _MaxoutConvStack(
            layer_filters=tuple(layer_filters),
            proj_layers=self.proj_layers,
            proj_dim=self.proj_dim,
            class_n=self.class_n,
            flat_dim=pooled_dim * (last_filt // 2),
            mask_div_fn=mask_div,
            inner_dropout=self.inner_dropout,
            init_name=self.init_name,
            pool_after_first=True,
            dropout_impl=self.dropout_impl,
            name="body",
        )(emb, input_lengths, training)


class CNNStrideEncoder(nn.Module):
    """Stride variant (``--model-conv-is-mp=False``): ConvFrontEnd + body."""

    enc_num: int
    class_n: int
    feat_dim: int
    nfilt_inp: int = 64
    nfilt_inn: int = 128
    proj_layers: int = 3
    proj_dim: int = 512
    conv_layer_num: int = 2
    conv_filter_num: int = 64
    input_dropout: float = 0.1
    inner_dropout: float = 0.1
    init_name: Optional[str] = None
    dropout_impl: str = "xla"

    @classmethod
    def from_config(cls, config, class_n, **overrides):
        kwargs = dict(
            enc_num=config.model_encoder_num,
            class_n=class_n,
            feat_dim=config.feat_dim,
            nfilt_inp=config.model_conv_inp_nfilt,
            nfilt_inn=config.model_conv_inn_nfilt,
            proj_layers=config.model_conv_proj_num,
            proj_dim=config.model_conv_proj_dim,
            conv_layer_num=config.model_conv_layer_num,
            conv_filter_num=config.model_conv_filter_num,
            input_dropout=config.train_inp_dropout,
            inner_dropout=config.train_inn_dropout,
            init_name=config.model_initializer,
            dropout_impl=getattr(config, "tpu_dropout_kernel", "xla"),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @nn.compact
    def __call__(self, feats, input_lengths, training: bool):
        assert self.conv_layer_num < 4
        if self.enc_num < 5:
            raise ValueError(
                "the maxout CNN needs --model-encoder-num >= 5 "
                "(got %d)" % self.enc_num)
        stride = 2  # reference hard-codes stride 2 for the front-end
        fe_dim = math.ceil(self.feat_dim / (stride**self.conv_layer_num))
        last_filt = (self.proj_dim // fe_dim) * 2
        layer_filters = [(self.nfilt_inp, 1)] * 4
        for i in range(4, self.enc_num - 1):
            layer_filters.append((self.nfilt_inn, 1))
        layer_filters.append((last_filt, 1))

        cnn_n = self.conv_layer_num

        def mask_div(idx):
            # reference quirk: cnn_n ** stride (cnn_stride_encoder.py:165)
            return cnn_n**stride

        emb = ConvFrontEnd(
            cnn_n=cnn_n,
            nfilt=self.conv_filter_num,
            stride=stride,
            init_name=self.init_name,
            name="conv_feat",
        )(feats, input_lengths, training)
        if self.dropout_impl == "pallas" and training and self.input_dropout > 0:
            emb = fused_dropout(
                emb,
                jax.random.bits(self.make_rng("dropout"), (), jnp.uint32),
                self.input_dropout,
            )
        elif self.dropout_impl != "pallas":
            emb = nn.Dropout(
                rate=self.input_dropout, deterministic=not training
            )(emb)
        return _MaxoutConvStack(
            layer_filters=tuple(layer_filters),
            proj_layers=self.proj_layers,
            proj_dim=self.proj_dim,
            class_n=self.class_n,
            flat_dim=fe_dim * (last_filt // 2),
            mask_div_fn=mask_div,
            inner_dropout=self.inner_dropout,
            init_name=self.init_name,
            pool_after_first=False,
            dropout_impl=self.dropout_impl,
            name="body",
        )(emb, input_lengths, training)
