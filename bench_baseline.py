"""Measure the reference implementation's training throughput on this host.

Runs the ORIGINAL reference code (imported read-only from /root/reference —
nothing is copied into this repo) on the same canonical SRF-TIMIT workload
bench.py uses, and caches the result in BASELINE_MEASURED.json, which
bench.py then uses as the ``vs_baseline`` denominator.

This host has no GPU, so the reference runs on TF-CPU; the JSON records the
hardware so the ratio is interpretable (the reference's native habitat was
a CUDA GPU — see BASELINE.md).

Usage:  python bench_baseline.py [--batch 8] [--iters 3]
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--frames", type=int, default=241)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--warmup", type=int, default=1)
    args = parser.parse_args()

    sys.path.insert(0, "/root/reference")
    import tensorflow as tf
    from tfsr.model.sequence_router_naive import SequenceRouter as SRFN

    config = types.SimpleNamespace(
        model_initializer="fan_avg",
        model_conv_layer_num=2,
        model_conv_filter_num=64,
        feat_dim=123,
        model_encoder_num=7,
        model_caps_iter=1,
        model_caps_window_lpad=1,
        model_caps_window_rpad=1,
        model_caps_context=True,
        model_caps_primary_num=60,
        model_caps_primary_dim=8,
        model_caps_convolution_num=30,
        model_caps_convolution_dim=8,
        model_caps_class_dim=8,
        train_inp_dropout=0.1,
        train_inn_dropout=0.1,
    )

    class _Log:
        def info(self, *a, **k):
            pass

    model = SRFN(config, _Log(), 63)
    opti = tf.keras.optimizers.Adam(1e-4)

    rng = np.random.RandomState(0)
    batch = args.batch
    feats = tf.constant(rng.randn(batch, args.frames, 123), tf.float32)
    lens = rng.randint(int(args.frames * 0.7), args.frames + 1, size=batch)
    lens[0] = args.frames  # reference crops to batch max; keep max == frames
    inp_len = tf.constant(lens, tf.int32)
    tar_len = tf.constant(np.maximum(2, inp_len.numpy() // 8), tf.int32)
    labels = tf.constant(
        rng.randint(1, 62, size=(batch, int(tar_len.numpy().max()))), tf.int32
    )

    @tf.function
    def train_step():
        with tf.GradientTape() as tape:
            # model.call directly: this TF's Keras strips the `training`
            # kwarg that the reference's call() reads from **kwargs
            y_pred = model.call(feats, input_lengths=inp_len, training=True)
            pe_loss = tf.nn.ctc_loss(
                labels, y_pred, tar_len,
                tf.math.ceil(inp_len / 4),
                logits_time_major=False, blank_index=62,
            )
            loss = tf.reduce_mean(pe_loss)
        grads = tape.gradient(loss, model.trainable_variables)
        opti.apply_gradients(zip(grads, model.trainable_variables))
        return loss

    for _ in range(args.warmup):
        loss = train_step()
    print("warmup loss", float(loss))

    start = time.perf_counter()
    for _ in range(args.iters):
        loss = train_step()
    _ = float(loss)
    elapsed = time.perf_counter() - start
    utts_per_sec = batch * args.iters / elapsed
    print("reference: %.3f utt/s (%.2f s/step, batch %d)"
          % (utts_per_sec, elapsed / args.iters, batch))

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
    record = {}
    if os.path.exists(out_path):
        try:
            record = json.load(open(out_path))
        except ValueError:
            record = {}
    record.update(
        {
            "srf_timit_train_utts_per_sec": round(utts_per_sec, 3),
            "hardware": "host CPU (%d thread) — no GPU on this host; "
                        "reference's native habitat is CUDA" % os.cpu_count(),
            "tf_version": tf.__version__,
            "workload": "canonical SRF-TIMIT naive SDR L7 PH60 CH30 D8 "
                        "W1+1+1, batch %d x %d frames" % (batch, args.frames),
        }
    )
    json.dump(record, open(out_path, "w"), indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
