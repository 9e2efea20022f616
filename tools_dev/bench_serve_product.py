"""Dev bench: the PRODUCT serving path (Recognizer.transcribe_batch).

bench_serve_batch.py times the raw forward + decode kernels; this bench
times what a deployment actually calls — ``Recognizer.transcribe_batch``
over a real checkpoint, including input padding, the jitted forward, the
batched decode, backtrace, text mapping, and the per-token confidence
machinery. The gap between the two is serving overhead (host transfers,
python post-processing) and is exactly what the logp-gather optimization
targets (see BENCH_NOTES "serving product path").

Builds the canonical SRF-TIMIT architecture (reference:
egs/script/train_srf_timit.sh defaults), saves a random-init checkpoint to
a temp dir once, and drives the real Recognizer over it.

Run: python tools_dev/bench_serve_product.py [--batch 64] [--frames 768]
     [--impl beam,greedy] [--iters 5]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

CANON_ARGV = [
    "prog",
    "--config=egs/conf/timit.conf",
    "--feat-type=None",
    "--model-caps-primary-num=60",
    "--model-caps-convolution-num=30",
    "--model-caps-primary-dim=8",
    "--model-caps-convolution-dim=8",
    "--model-caps-class-dim=8",
    "--model-caps-type=naive",
    "--model-caps-window-lpad=1",
    "--model-caps-window-rpad=1",
    "--model-caps-context=True",
    "--model-caps-iter=1",
    "--model-encoder-num=7",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--frames", type=int, default=768)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--beam", type=int, default=100)
    parser.add_argument("--impl", default="beam,greedy")
    parser.add_argument("--n-best", type=int, default=1)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from srf_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from srf_tpu.config import Logger, ParseOption
    from srf_tpu.models.registry import build_model
    from srf_tpu.serve import Recognizer
    from srf_tpu.utils.checkpoint import CheckpointManager
    from srf_tpu.utils.vocab import get_file_path, load_vocab

    logger = Logger(name="bench-serve-product", level=Logger.INFO).logger
    tmp = tempfile.mkdtemp(prefix="srf_serve_bench_")
    argv = CANON_ARGV + [
        "--path-base=%s" % tmp,
        "--path-ckpt=%s/ckpt" % os.path.join(tmp),
        "--decoding-beam-width=%d" % args.beam,
    ]
    config = ParseOption(argv, logger, is_print_opts=False).args

    # random-init the canonical model and save a real checkpoint once
    _, _, dec_in_dim, _ = load_vocab(
        get_file_path(config.path_base, config.path_vocab), logger
    )
    model, _ = build_model(config, dec_in_dim + 1, logger)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 20, config.feat_dim), jnp.float32)
    variables = jax.jit(
        lambda r, f, l: model.init(r, f, l, False)
    )({"params": rng, "dropout": rng}, dummy, jnp.full((1,), 20, jnp.int32))
    manager = CheckpointManager(config.path_ckpt)
    manager.save(1, {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
    })
    manager.close()

    recognizer = Recognizer(config, logger)
    host = np.random.RandomState(0)
    feats_list = [
        host.randn(args.frames, config.feat_dim).astype(np.float32)
        for _ in range(args.batch)
    ]
    audio_secs = args.frames * 0.01 * args.batch

    def measure_upload():
        """Feature-upload share of one batch: device_put of the padded
        [B, T, F] block + a one-element value fetch (the only reliable
        fence on the remote backend). Reported separately so the
        end-to-end number can be decomposed into link vs chip+host work
        (VERDICT r4 #7: the tunnel confounded the product-path figure)."""
        width = -(-args.frames // 128) * 128
        padded = np.zeros((args.batch, width, config.feat_dim), np.float32)
        for i, f in enumerate(feats_list):
            padded[i, : f.shape[0]] = f
        ts = []
        for _ in range(max(args.iters, 3)):
            block = padded + np.float32(1e-7)  # defeat any transfer cache
            t0 = time.perf_counter()
            dev = jax.device_put(block)
            np.asarray(dev[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        return {
            "mb": round(padded.nbytes / 1e6, 1),
            "ms_median": round(1e3 * float(np.median(ts)), 1),
            "ms_min": round(1e3 * min(ts), 1),
            "ms_max": round(1e3 * max(ts), 1),
        }

    def run(tag, beam_width, upload):
        kwargs = dict(beam_width=beam_width, pad_multiple=128)
        call = recognizer.transcribe_batch
        if args.n_best > 1:
            kwargs["n_best"] = args.n_best
            call = recognizer.transcribe_batch_detailed
        call(feats_list, **kwargs)  # warm/compile
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            call(feats_list, **kwargs)
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        # chip+host share: end-to-end minus the separately measured
        # feature upload (approximate — upload does not overlap compute
        # in this path, so the subtraction is the right decomposition)
        compute_s = max(med - upload["ms_median"] / 1e3, 1e-9)
        print(json.dumps({
            "metric": "srf_timit_serve_product_%s" % tag,
            "batch": args.batch,
            "frames": args.frames,
            "utt_per_s": round(args.batch / med, 1),
            "utt_per_s_min": round(args.batch / max(ts), 1),
            "utt_per_s_max": round(args.batch / min(ts), 1),
            "x_realtime": round(audio_secs / med, 1),
            "upload": upload,
            "compute_utt_per_s": round(args.batch / compute_s, 1),
            "compute_x_realtime": round(audio_secs / compute_s, 1),
            "iters": args.iters,
        }), flush=True)

    upload = measure_upload()
    impls = args.impl.split(",")
    if "beam" in impls:
        run("beam", args.beam, upload)
    if "greedy" in impls:
        run("greedy", None, upload)


if __name__ == "__main__":
    main()
