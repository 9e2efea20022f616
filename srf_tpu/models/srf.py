"""SequenceRouter: the capsule-network SRF CTC acoustic model.

One unified implementation replacing the reference's three kernel flavors
(tfsr/model/sequence_router_naive.py, sequence_router_lowmemory.py,
sequence_router_einsum.py — all the same math with different memory plans;
here the memory plan is a scan/chunk decision inside ops/routing.py, and
``--model-caps-type`` is accepted for compatibility):

Forward pass (reference: sequence_router_naive.py:120-193):
    CNN front-end (maxout convs, 4x time subsample)
    -> reshape -> Dense(PH) bottleneck ("flatten")
    [einsum flavor only: *sqrt(PH) + positional encoding
     (reference: sequence_router_einsum.py:130-131)]
    -> two parallel 3x3 Conv(PD) + dropout(0.2), maxout ("encaps")
    -> length-mask -> [B,T',PH,PD] -> squash -> flattened LayerNorm
    -> input dropout
    -> enc_num x { windowing -> routing (DR or SDR) -> flattened LayerNorm
                   -> dropout }
    -> logits = LayerNorm(||class capsules||)   (class logit = capsule norm)

Capsule stack geometry (reference: sequence_router_naive.py:88-95):
    primary (PH x PD) -> (enc_num-2) x conv capsules (CH x CD)
    -> class capsules (class_n x VD); in-capsules multiply by the window.

Flavor quirks preserved:
- ``lowmemory`` forces exactly 1 routing iteration
  (reference: sequence_router_lowmemory.py:107 "Iter x 1 (fixed)"),
- ``einsum`` adds positional encoding to the bottleneck and uses
  epsilon=1e-9 in the output length (reference: sequence_router_einsum.py:
  130-131,238); others use 1e-7.
The lowmemory DR path's missing W-multiply bug is NOT preserved (see
ops/routing.py docstring).
"""


from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from srf_tpu.models.initializers import get_init, routing_weight_init
from srf_tpu.models.layers import ConvFrontEnd
from srf_tpu.ops.masking import feat_mask
from srf_tpu.ops.pos_enc import get_pos_enc
from srf_tpu.ops.routing import (
    dynamic_routing,
    predict_capsules,
    route_layer,
    sequential_routing,
    wavefront_sdr_stack,
    window_slide,
    window_stack,
)
from srf_tpu.ops.squash import capsule_length, squash


class SequenceRouter(nn.Module):
    feat_dim: int
    class_n: int
    enc_num: int
    caps_primary_num: int
    caps_primary_dim: int
    caps_conv_num: int
    caps_conv_dim: int
    caps_class_dim: int
    caps_iter: int
    lpad: int
    rpad: int
    is_context: bool  # True = SDR, False = DR
    conv_layer_num: int = 2
    conv_filter_num: int = 64
    inp_dropout: float = 0.1
    inn_dropout: float = 0.1
    init_name: Optional[str] = None
    caps_type: str = "lowmemory"  # lowmemory | naive | einsum
    stride: int = 2
    time_chunk: Optional[int] = None  # SDR u_hat chunking (MXU batching)
    routing_impl: str = "auto"  # auto(factored) | xla | ... (--tpu-routing-kernel)
    routing_remat: bool = True  # checkpoint the SDR scan body (1.5x faster bwd, see BENCH_NOTES)
    routing_unroll: int = 1  # scan body unroll factor (measured: >1 hurts on v5e)
    routing_bf16: bool = False  # bf16 prediction/products inside the SDR body

    @classmethod
    def from_config(cls, config, class_n, **overrides):
        kwargs = dict(
            feat_dim=config.feat_dim,
            class_n=class_n,
            enc_num=config.model_encoder_num,
            caps_primary_num=config.model_caps_primary_num,
            caps_primary_dim=config.model_caps_primary_dim,
            caps_conv_num=config.model_caps_convolution_num,
            caps_conv_dim=config.model_caps_convolution_dim,
            caps_class_dim=config.model_caps_class_dim,
            caps_iter=config.model_caps_iter,
            lpad=config.model_caps_window_lpad,
            rpad=config.model_caps_window_rpad,
            is_context=config.model_caps_context,
            conv_layer_num=config.model_conv_layer_num,
            conv_filter_num=config.model_conv_filter_num,
            inp_dropout=config.train_inp_dropout,
            inn_dropout=config.train_inn_dropout,
            init_name=config.model_initializer,
            caps_type=config.model_caps_type,
            # forward the stride: the registry computes in_len_div from
            # config.model_conv_stride, so dropping it here would
            # mis-size every CTC length on non-default strides
            stride=config.model_conv_stride,
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    def stream_margin_posts(self):
        """(left, right) streaming window margin in post-subsample frames.

        The margins must cover the front-end receptive field so a windowed
        forward reproduces the whole-utterance conv grid exactly: each of
        the ``conv_layer_num`` 3x3 stride-``s`` layers extends the field by
        s^(i-1) raw frames and the encaps 3x3 conv adds one post frame, so
        the total is <= 2 post frames for s >= 2 (3 is generous); for
        s == 1 the field is conv_layer_num + 1 raw (= post) frames.
        streaming.StreamingTranscriber and stream_step must agree on these
        numbers — this method is the single source of truth (ADVICE r1).
        """
        margin = 3 if self.stride > 1 else self.conv_layer_num + 2
        return margin, margin

    def layer_shapes(self):
        """[(in_n, out_n, out_d, in_d)] per capsule layer
        (reference: sequence_router_naive.py:88-95)."""
        window = self.lpad + self.rpad + 1
        ph, pd = self.caps_primary_num, self.caps_primary_dim
        ch, cd = self.caps_conv_num, self.caps_conv_dim
        vd = self.caps_class_dim
        if self.enc_num == 1:
            return [(ph * window, self.class_n, vd, pd)]
        shapes = [(ph * window, ch, cd, pd)]
        for _ in range(1, self.enc_num - 1):
            shapes.append((ch * window, ch, cd, cd))
        shapes.append((ch * window, self.class_n, vd, cd))
        return shapes

    def setup(self):
        # Explicit attribute names reproduce the compact-era param tree
        # (conv_feat, flatten, encaps1/2, ln_input, W%d/b%d, ln_mid%d,
        # ln_output) so checkpoints and weight transplants are unaffected.
        self.conv_feat = ConvFrontEnd(
            cnn_n=self.conv_layer_num,
            nfilt=self.conv_filter_num,
            stride=self.stride,
            init_name=self.init_name,
        )
        self.flatten = nn.Dense(
            self.caps_primary_num, kernel_init=get_init(self.init_name)
        )
        self.encaps1 = nn.Conv(
            features=self.caps_primary_dim, kernel_size=(3, 3),
            strides=(1, 1), padding="SAME",
            kernel_init=get_init(self.init_name),
        )
        self.encaps2 = nn.Conv(
            features=self.caps_primary_dim, kernel_size=(3, 3),
            strides=(1, 1), padding="SAME",
            kernel_init=get_init(self.init_name),
        )
        self.ln_input = nn.LayerNorm(epsilon=1e-3)
        w_init = routing_weight_init()
        weights, biases = [], []
        for i, (in_n, out_n, out_d, in_d) in enumerate(self.layer_shapes()):
            weights.append(
                self.param("W%d" % i, w_init, (in_n, out_n, out_d, in_d))
            )
            biases.append(self.param("b%d" % i, w_init, (in_n, out_n, out_d)))
            setattr(self, "ln_mid%d" % (i + 1), nn.LayerNorm(epsilon=1e-3))
        self.routing_weights = weights
        self.routing_biases = biases
        self.ln_output = nn.LayerNorm(epsilon=1e-3)
        self.drop_encaps = nn.Dropout(rate=0.2)
        self.drop_inp = nn.Dropout(rate=self.inp_dropout)
        self.drop_inn = nn.Dropout(rate=self.inn_dropout)

    def _capsulate(self, feats, input_lengths, training: bool,
                   pos_enc_override=None):
        """Front-end through primary capsules: [B,T,feat] -> [B,T',PH,PD].

        ``pos_enc_override`` (einsum flavor only): positional-encoding slice
        for windows that do not start at t=0 (streaming).
        """
        conv_out = self.conv_feat(feats, input_lengths, training)
        batch, seq_len = conv_out.shape[0], conv_out.shape[1]

        emb = conv_out.reshape(batch, seq_len, -1)
        emb = self.flatten(emb)
        if self.caps_type == "einsum":
            emb = emb * jnp.sqrt(float(self.caps_primary_num))
            pos = (
                pos_enc_override if pos_enc_override is not None
                else get_pos_enc(seq_len, self.caps_primary_num)
            )
            emb = emb + pos
        emb = emb[..., None]  # [B, T', PH, 1]

        deterministic = not training
        branches = [
            self.drop_encaps(self.encaps1(emb), deterministic=deterministic),
            self.drop_encaps(self.encaps2(emb), deterministic=deterministic),
        ]
        emb = jnp.maximum(branches[0], branches[1])
        # the reference hardcodes stride**2 here regardless of
        # conv_layer_num (reference: sequence_router_naive.py:134) — wrong
        # for any other geometry (masks a different rate than the conv
        # stack produced). We use the true subsampling divisor: identical
        # at the default (2 layers, stride 2), correct elsewhere, and it
        # makes every geometry streamable (see PARITY.md).
        emb = feat_mask(emb, input_lengths, self.stride**self.conv_layer_num)

        emb = emb.reshape(batch, seq_len, self.caps_primary_num, self.caps_primary_dim)
        emb = squash(emb, axis=-1)
        flat = emb.reshape(batch, seq_len, -1)
        flat = self.ln_input(flat)
        emb = flat.reshape(batch, seq_len, self.caps_primary_num, self.caps_primary_dim)
        return self.drop_inp(emb, deterministic=deterministic)

    def route_block(self, u_ctx, layer_idx, v_init=None, step_valid=None):
        """One capsule layer on a streaming block (eval mode, no dropout).

        ``u_ctx`` [B, lpad+K+rpad, n, d] carries the window context
        explicitly (no zero padding); returns (out [B, K, out_n, out_d],
        v_last [B, out_n, out_d]). ``step_valid`` [K] zeroes warm-up frames
        (t < 0) in both the emitted block and the SDR carry, matching the
        batch implementation's window zero padding.
        """
        num_iter = 1 if self.caps_type == "lowmemory" else self.caps_iter
        wgt = self.routing_weights[layer_idx]
        bias = self.routing_biases[layer_idx]
        u_win = window_slide(u_ctx, self.lpad, self.rpad)
        is_last = layer_idx == self.enc_num - 1
        if self.is_context:
            out = sequential_routing(
                u_win, wgt, bias, num_iter, mask_pad_capsule=is_last,
                v_init=v_init, step_valid=step_valid,
            )
        else:
            u_hat = predict_capsules(u_win, wgt, bias)
            out = dynamic_routing(u_hat, num_iter, mask_pad_capsule=is_last)
            if step_valid is not None:
                out = jnp.where(step_valid[None, :, None, None], out, 0.0)
        v_last = out[:, -1]
        batch, k = out.shape[0], out.shape[1]
        out_n, out_d = out.shape[2], out.shape[3]
        flat = out.reshape(batch, k, -1)
        flat = getattr(self, "ln_mid%d" % (layer_idx + 1))(flat)
        out = flat.reshape(batch, k, out_n, out_d)
        if step_valid is not None:
            out = jnp.where(step_valid[None, :, None, None], out, 0.0)
        return out, v_last

    def output_block(self, emb):
        """Class capsules -> CTC logits (the model's output head)."""
        eps = 1e-9 if self.caps_type == "einsum" else 1e-7
        logits = capsule_length(emb, axis=-1, epsilon=eps)
        return self.ln_output(logits)

    def stream_step(self, window, length, lpost, bufs, vprevs, offsets,
                    pos_enc_override=None):
        """One fused streaming step: raw window -> logits block + carries.

        Runs the front-end and the WHOLE capsule cascade in a single jitted
        call (one host dispatch per chunk — the per-layer dispatch latency
        dominates otherwise). ``lpost`` (traced) selects the emitted K
        post-frames inside the window; ``offsets`` [L] are each layer's
        global index of its block's first output frame (for warm-up
        masking). Returns (logits [1, K, class_n], new_bufs, new_vprevs).
        """
        caps = self._capsulate(
            window, jnp.reshape(length, (1,)), False,
            pos_enc_override=pos_enc_override,
        )
        ctx = self.lpad + self.rpad
        # K is static: window posts minus the margins (shared source of
        # truth with StreamingTranscriber's window geometry)
        lm, rm = self.stream_margin_posts()
        k = caps.shape[1] - (lm + rm)
        block = jax.lax.dynamic_slice_in_dim(caps, lpost, k, axis=1)
        new_bufs, new_vprevs = [], []
        for i in range(self.enc_num):
            u_ctx = jnp.concatenate([bufs[i], block], axis=1)
            step_valid = offsets[i] + jnp.arange(k) >= 0
            out, v_last = self.route_block(u_ctx, i, vprevs[i], step_valid)
            new_bufs.append(u_ctx[:, u_ctx.shape[1] - ctx:] if ctx
                            else bufs[i])
            new_vprevs.append(v_last)
            block = out
        return self.output_block(block), new_bufs, new_vprevs

    def __call__(self, feats, input_lengths, training: bool):
        num_iter = 1 if self.caps_type == "lowmemory" else self.caps_iter

        emb = self._capsulate(feats, input_lengths, training)
        batch, seq_len = emb.shape[0], emb.shape[1]

        shapes = self.layer_shapes()
        if self.is_context and self.routing_impl == "wavefront":
            if self.routing_bf16 or (self.time_chunk and self.time_chunk > 1):
                # fail loudly rather than benchmark f32 believing it's bf16
                raise ValueError(
                    "--tpu-routing-kernel=wavefront does not support bf16 "
                    "routing or time chunking; use auto/xla/xla_pre"
                )
            # whole capsule stack as ONE scan over time (see
            # ops/routing.py wavefront_sdr_stack); the per-layer LayerNorm
            # params are materialized by a dummy call and applied manually
            # inside the scan
            layer_params, ln_params = [], []
            for i, (in_n, out_n, out_d, in_d) in enumerate(shapes):
                layer_params.append(
                    (self.routing_weights[i], self.routing_biases[i])
                )
                ln = getattr(self, "ln_mid%d" % (i + 1))
                ln(jnp.zeros((1, out_n * out_d), jnp.float32))  # build params
                lnp = self.get_variable("params", "ln_mid%d" % (i + 1))
                ln_params.append((lnp["scale"], lnp["bias"]))
            use_dropout = training and self.inn_dropout > 0.0
            emb = wavefront_sdr_stack(
                emb, layer_params, self.lpad, self.rpad, num_iter,
                ln_params, dropout_rate=self.inn_dropout,
                dropout_rng=self.make_rng("dropout") if use_dropout else None,
                remat=self.routing_remat,
            )
        else:
            for i, (in_n, out_n, out_d, in_d) in enumerate(shapes):
                emb = window_stack(emb, self.lpad, self.rpad)
                assert emb.shape[2] == in_n and emb.shape[3] == in_d, (
                    emb.shape, (in_n, in_d),
                )
                emb = route_layer(
                    emb, self.routing_weights[i], self.routing_biases[i],
                    num_iter, self.is_context,
                    is_last_layer=(i == self.enc_num - 1),
                    time_chunk=self.time_chunk,
                    impl=self.routing_impl,
                    remat=self.routing_remat,
                    unroll=self.routing_unroll,
                    compute_dtype=jnp.bfloat16 if self.routing_bf16 else None,
                )
                flat = emb.reshape(batch, seq_len, -1)
                flat = getattr(self, "ln_mid%d" % (i + 1))(flat)
                emb = flat.reshape(batch, seq_len, out_n, out_d)
                emb = self.drop_inn(emb, deterministic=not training)

        return self.output_block(emb)
