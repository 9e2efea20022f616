"""Dev bench: int8 weight-only quantization on small-batch serving.

Small-batch eval forwards are HBM-bandwidth-bound on the weight stream;
--tpu-serve-quant=int8 (ops/quant.py) keeps an int8 + per-channel-scale
copy resident and dequantizes inside the jitted forward. This measures
the actual effect per dense family at serving batch sizes (the SRF scan
is latency-bound, not weight-bound — not expected to move).

Run: python tools_dev/bench_quant.py [--family stf_wsj|cnn_wsj|all]
     [--batches 1,8] [--iters 20]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench_one(name, model, vocab, frames, batch, iters, max_ndim=64):
    import jax
    import jax.numpy as jnp

    from srf_tpu.ops.quant import (
        dequantize_tree, quantize_tree, quantized_bytes)

    rng = jax.random.PRNGKey(0)
    host = np.random.RandomState(0)
    feats = jnp.asarray(host.randn(batch, frames, 123), jnp.float32)
    lens = jnp.full((batch,), frames, jnp.int32)
    variables = jax.jit(
        lambda r, f, l: model.init(r, f, l, False)
    )({"params": rng, "dropout": rng}, feats, lens)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fwd_f32(p, f, l):
        v = {"params": p}
        if stats:
            v["batch_stats"] = stats
        return model.apply(v, f, l, False)

    def fwd_q(qp, f, l):
        return fwd_f32(dequantize_tree(qp), f, l)

    qparams = jax.jit(
        lambda p: quantize_tree(p, max_ndim=max_ndim))(params)
    q_b, f_b = quantized_bytes(jax.device_get(qparams))

    out = {}
    for tag, fn, p in (("f32", jax.jit(fwd_f32), params),
                       ("int8", jax.jit(fwd_q), qparams)):
        r = fn(p, feats, lens)
        r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(p, feats, lens)
        r.block_until_ready()
        out[tag] = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({
        "family": name, "batch": batch, "frames": frames,
        "weights_mb_f32": round(f_b / 1e6, 1),
        "weights_mb_int8": round(q_b / 1e6, 1),
        "f32_ms": round(out["f32"], 2), "int8_ms": round(out["int8"], 2),
        "speedup": round(out["f32"] / out["int8"], 3),
    }), flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", default="all")
    parser.add_argument("--batches", default="1,8")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--max-ndim", type=int, default=64,
                        help="quantize only leaves with ndim <= this "
                             "(2 = Dense kernels only, convs stay f32)")
    args = parser.parse_args()

    from srf_tpu.models.cnn import CNNStrideEncoder
    from srf_tpu.models.stf import ConvEncoder

    fams = {
        "stf_wsj": (ConvEncoder(num_layers=20, d_model=256, num_heads=4,
                                dff=1488, feat_dim=123, vocab_n=32,
                                attention_impl="plain"), 32),
        "cnn_wsj": (CNNStrideEncoder(enc_num=15, class_n=32, feat_dim=123,
                                     nfilt_inp=200, nfilt_inn=430,
                                     proj_layers=3, proj_dim=2048), 32),
    }
    for name, (model, vocab) in fams.items():
        if args.family in ("all", name):
            for b in map(int, args.batches.split(",")):
                bench_one(name, model, vocab, 600, b, args.iters,
                          max_ndim=args.max_ndim)


if __name__ == "__main__":
    main()
