"""Dev bench: train-step throughput + MFU of the non-SRF canonical recipes.

Covers the model families BENCH_NOTES' SRF campaign skips:
- STF-TIMIT / STF-WSJ (reference: egs/script/train_stf_{timit,wsj}.sh),
- BLSTM-WSJ (reference: egs/script/train_lstm_wsj.sh — L=5 blstm, D=534,
  CNN-FE on; representative 24,000-frame bucket -> batch 40 x 600),
- CNN-TIMIT maxpool (train_cnn_timit.sh — L=10, filt 128/256, proj
  3x1024, stride 1; 7,000-frame bucket -> batch 29 x 241),
- CNN-WSJ stride (train_cnn_wsj.sh — L=15, filt 200/430, proj 3x2048;
  24,000-frame bucket -> batch 40 x 600).

Emits ms/step, utt/s/chip, analytic model FLOPs (srf_tpu/utils/flops.py)
and MFU vs the v5e bf16 peak (plus the f32-relative number).

Run: python tools_dev/bench_families.py [--family ...] [--bf16] [--json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench(name, model, batch, frames, vocab, in_len_div, iters=10,
          stf_pen=None, bf16=False, flops_per_step=None, emit_json=False,
          quiet=False):
    import jax

    from srf_tpu.utils.flops import V5E_PEAK_BF16, V5E_PEAK_F32

    import jax.numpy as jnp
    import optax

    from srf_tpu.train.optimizer import noam_schedule
    from srf_tpu.train.state import TrainState
    from srf_tpu.train.step import make_apply_fn, make_train_step

    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    lens = host.randint(int(frames * 0.7), frames + 1, size=batch).astype(np.int32)
    data = {
        "feats": jnp.asarray(host.randn(batch, frames, 123), jnp.float32),
        "labels": jnp.asarray(
            host.randint(1, vocab, size=(batch, max(2, frames // 8)))
        ).astype(jnp.int32),
        "inp_len": jnp.asarray(lens),
        "tar_len": jnp.asarray(np.maximum(2, lens // 8)),
    }
    extra_kwargs_fn, kw1 = None, {}
    if stf_pen is not None:
        from srf_tpu.trainer_tf import make_stf_extra_kwargs

        extra_kwargs_fn = make_stf_extra_kwargs(stf_pen, in_len_div)
        kw1 = extra_kwargs_fn({k: v[:1] for k, v in data.items()})
    variables = jax.jit(
        lambda r, f, l: model.init(r, f, l, False, **kw1)
    )({"params": rng, "dropout": rng}, data["feats"][:1],
      data["inp_len"][:1])
    tx = optax.adam(noam_schedule(0.5, 1, 1200))
    state = TrainState.create(
        variables["params"], tx, variables.get("batch_stats", {})
    )
    train_step = make_train_step(
        make_apply_fn(model, extra_kwargs_fn, bf16=bf16), tx, in_len_div,
        mesh=None, donate=False,
    )

    def sync(m):
        return float(jax.device_get(m["loss_sum"]))

    for _ in range(3):
        state, metrics = train_step(state, data, rng)
    loss = sync(metrics)
    start = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, data, rng)
    sync(metrics)
    dt = (time.perf_counter() - start) / iters
    row = {
        "family": name,
        "dtype": "bf16" if bf16 else "f32",
        "ms_per_step": round(dt * 1e3, 2),
        "utt_per_s": round(batch / dt, 1),
        "batch": batch,
        "frames": frames,
        "loss": round(loss / batch, 3),
    }
    if flops_per_step is not None:
        row["model_flops_per_step"] = flops_per_step
        row["mfu_bf16peak"] = round(flops_per_step / dt / V5E_PEAK_BF16, 4)
        row["mfu_f32peak"] = round(flops_per_step / dt / V5E_PEAK_F32, 4)
    if quiet:
        pass
    elif emit_json:
        print(json.dumps(row), flush=True)
    else:
        mfu_s = (
            "  MFU %5.1f%% bf16peak / %5.1f%% f32peak"
            % (100 * row["mfu_bf16peak"], 100 * row["mfu_f32peak"])
            if flops_per_step is not None else ""
        )
        print("%-12s %-4s %7.2f ms/step  (%7.1f utt/s/chip, batch %d x %d)%s"
              % (name, row["dtype"], dt * 1e3, batch / dt, batch, frames,
                 mfu_s), flush=True)
    return row


def family_specs(iters=10, bf16=False, emit_json=False, quiet=False,
                 dropout_kernel="xla"):
    """The five canonical non-SRF recipes as name -> thunk returning the
    measured row dict (also importable by the round scoreboard bench.py)."""
    from srf_tpu.models.cnn import CNNEncoder, CNNStrideEncoder
    from srf_tpu.models.lstm import LstmEncoder
    from srf_tpu.models.stf import ConvEncoder
    from srf_tpu.ops.attention_penalty import AttentionPenalty
    from srf_tpu.ops.blockwise_attention import PenaltyParams
    from srf_tpu.utils.flops import (
        cnn_maxpool_forward_flops, cnn_stride_forward_flops,
        lstm_forward_flops, stf_forward_flops,
    )

    def stf(d_model, dff, vocab):
        ap = AttentionPenalty(max_len=2500, num_head=4, zero_width=1,
                              stripe_width=1, scale=1.0)
        pen = PenaltyParams(1, 1, 1.0, ap.n_stripes)
        return ap, ConvEncoder(
            num_layers=20, d_model=d_model, num_heads=4, dff=dff,
            feat_dim=123, vocab_n=vocab + 1, nfilt=64, cnn_n=2,
            penalty_params=pen,
        )

    common = dict(iters=iters, bf16=bf16, emit_json=emit_json, quiet=quiet)
    fams = {}
    ap_t, stf_t = stf(128, 1024, 62)
    fams["stf_timit"] = lambda: bench(
        "stf_timit", stf_t, 29, 241, 62, 4, stf_pen=ap_t,
        flops_per_step=3 * stf_forward_flops(
            29, 241, 123, num_layers=20, d_model=128, num_heads=4,
            dff=1024, vocab_n=63),
        **common,
    )
    ap_w, stf_w = stf(256, 1488, 31)
    fams["stf_wsj"] = lambda: bench(
        "stf_wsj", stf_w, 40, 600, 31, 4, stf_pen=ap_w,
        flops_per_step=3 * stf_forward_flops(
            40, 600, 123, num_layers=20, d_model=256, num_heads=4,
            dff=1488, vocab_n=32),
        **common,
    )
    fams["blstm_wsj"] = lambda: bench(
        "blstm_wsj",
        LstmEncoder(num_layers=5, d_model=534, vocab_n=32, feat_dim=123,
                    bidirectional=True, is_cnnfe=True),
        40, 600, 31, 4,
        flops_per_step=3 * lstm_forward_flops(
            40, 600, 123, num_layers=5, d_model=534, vocab_n=32,
            bidirectional=True, is_cnnfe=True),
        **common,
    )
    fams["cnn_timit"] = lambda: bench(
        # canonical TIMIT maxpool recipe uses time-stride 1 -> in_len_div 1
        "cnn_timit",
        CNNEncoder(enc_num=10, class_n=63, feat_dim=123, nfilt_inp=128,
                   nfilt_inn=256, proj_layers=3, proj_dim=1024, stride=1,
                   dropout_impl=dropout_kernel),
        29, 241, 62, 1,
        flops_per_step=3 * cnn_maxpool_forward_flops(
            29, 241, 123, enc_num=10, class_n=63, nfilt_inp=128,
            nfilt_inn=256, proj_layers=3, proj_dim=1024, stride=1),
        **common,
    )
    fams["cnn_wsj"] = lambda: bench(
        "cnn_wsj",
        CNNStrideEncoder(enc_num=15, class_n=32, feat_dim=123,
                         nfilt_inp=200, nfilt_inn=430, proj_layers=3,
                         proj_dim=2048, dropout_impl=dropout_kernel),
        40, 600, 31, 4,
        flops_per_step=3 * cnn_stride_forward_flops(
            40, 600, 123, enc_num=15, class_n=32, nfilt_inp=200,
            nfilt_inn=430, proj_layers=3, proj_dim=2048),
        **common,
    )
    return fams


def main():
    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", default="all")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--json", action="store_true")
    parser.add_argument("--dropout-kernel", default="xla",
                        choices=["xla", "pallas"],
                        help="CNN dropout implementation (the fused "
                             "hardware-PRNG kernel vs the default "
                             "threefry masks; ops/dropout_pallas.py)")
    args = parser.parse_args()
    fams = family_specs(iters=args.iters, bf16=args.bf16,
                        emit_json=args.json,
                        dropout_kernel=args.dropout_kernel)
    for name, fn in fams.items():
        if args.family in ("all", name):
            fn()


if __name__ == "__main__":
    main()
