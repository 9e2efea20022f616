"""WSJ-scale data-plane soak (VERDICT r3 item 3).

Generates a conf-shaped synthetic corpus at the reference's WSJ-si284
scale — 37,416 utterances over 100 TFRecord shards, 123-dim float32
features, duration distribution centered near si284's ~7.8 s — then
measures the input pipeline at that scale:

- eager ``SpeechDataset``: full-split load time + resident RSS (the
  "~13 GB" the r3 verdict flagged),
- out-of-core ``LazySpeechDataset``: index-scan time + resident RSS,
- one FULL epoch through ``BucketedLoader`` on the WSJ recipe geometry
  (--train-batch-frame=24000, reference egs/conf/wsj.conf), reporting
  epoch wall-clock, utt/s, batch/s and peak RSS for lazy (and
  optionally eager) reads,
- ``plan_lockstep_epoch`` planning cost for 2 simulated processes at
  full scale (the multi-process scheduling path).

Reference analog being sized against: the streaming tf.data reader
(tfsr/data/load_speech_data.py:43-46 — 100 MB read buffers, 10
parallel reads) over wsj.conf's si284 split.

Run:  python tools_dev/soak_wsj_data.py [--base /tmp/wsj_soak]
          [--utts 37416] [--shards 100] [--skip-eager] [--keep]

Also reusable at other geometries (VERDICT r4 #5 — the TIMIT-TPU recipe):
    python tools_dev/soak_wsj_data.py --skip-gen \
        --pattern '/tmp/timit_dress/tfrecord_graves13/timit-train-*' \
        --batch-frame 28000
measures the lazy/eager epoch rate of an EXISTING corpus on the given
frame budget (e.g. the b116 recipe's 28,000), giving the host-headroom
ratio vs the chip's measured consumption.
"""

import argparse
import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024


def generate(base, utts, shards, seed=0):
    from srf_tpu.data.example_proto import encode_example
    from srf_tpu.data.tfrecord import TFRecordWriter

    rng = np.random.RandomState(seed)
    os.makedirs(base, exist_ok=True)
    t0 = time.perf_counter()
    per = -(-utts // shards)
    nbytes = 0
    idx = 0
    # one reusable noise pool: generating 14 GB of fresh randn on one
    # host CPU would dominate the soak; the loader neither checks nor
    # cares that feature content repeats across utterances
    pool = rng.randn(4096, 123).astype(np.float32)
    for s in range(shards):
        path = os.path.join(
            base, "wsj-train-%05d-of-%05d.tfrecord" % (s, shards))
        with TFRecordWriter(path) as w:
            for _ in range(per):
                if idx >= utts:
                    break
                # si284-ish duration mix: lognormal around ~7.8 s
                frames = int(np.clip(rng.lognormal(6.55, 0.45), 80, 2400))
                off = rng.randint(0, 4096 - frames % 4096) if frames < 4096 else 0
                feats = pool[off:off + frames]
                if feats.shape[0] < frames:
                    reps = -(-frames // 4096)
                    feats = np.tile(pool, (reps, 1))[:frames]
                n_lab = max(4, frames // 8)
                labels = rng.randint(1, 30, size=n_lab).astype(np.int64)
                rec = encode_example({
                    "input_speech": feats.reshape(-1),
                    "target_label": labels,
                    "input_length": np.array([frames], np.int64),
                    "target_length": np.array([n_lab], np.int64),
                    "utt_id": [b"u%06d" % idx],
                })
                nbytes += len(rec) if isinstance(rec, (bytes, bytearray)) else 0
                w.write(rec)
                idx += 1
    gen_s = time.perf_counter() - t0
    disk = sum(
        os.path.getsize(os.path.join(base, f)) for f in os.listdir(base)
        if f.endswith(".tfrecord"))
    return {"utts": idx, "shards": shards, "gen_s": round(gen_s, 1),
            "disk_gb": round(disk / 1e9, 2)}


def epoch_through(loader, tag):
    t0 = time.perf_counter()
    batches = 0
    emitted = 0
    frames = 0
    for batch in loader:
        batches += 1
        emitted += batch["feats"].shape[0]
        frames += int(batch["feats"].shape[0] * batch["feats"].shape[1])
    dt = time.perf_counter() - t0
    return {"mode": tag, "epoch_s": round(dt, 1), "batches": batches,
            "utts": emitted,
            "utt_per_s": round(emitted / dt, 1),
            "batch_per_s": round(batches / dt, 2),
            "padded_mframe_per_s": round(frames / dt / 1e6, 2),
            "peak_rss_mb": rss_mb()}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base", default="/tmp/wsj_soak")
    parser.add_argument("--utts", type=int, default=37416)
    parser.add_argument("--shards", type=int, default=100)
    parser.add_argument("--skip-eager", action="store_true")
    parser.add_argument("--skip-gen", action="store_true",
                        help="reuse an existing corpus at --base")
    parser.add_argument("--keep", action="store_true")
    parser.add_argument("--pattern", default=None,
                        help="existing TFRecord glob (overrides --base)")
    parser.add_argument("--batch-frame", type=int, default=24000,
                        help="bucketing frame budget (wsj.conf 24000; "
                             "timit_tpu.conf 28000; timit.conf 7000)")
    args = parser.parse_args()

    from srf_tpu.data.bucketing import get_bucket_info
    from srf_tpu.data.loader import (
        BucketedLoader, LazySpeechDataset, SpeechDataset,
        plan_lockstep_epoch,
    )

    if not args.skip_gen and args.pattern is None:
        if os.path.exists(args.base):
            shutil.rmtree(args.base)
        print(json.dumps({"stage": "generate",
                          **generate(args.base, args.utts, args.shards)}),
              flush=True)
    pattern = args.pattern or os.path.join(args.base, "wsj-train-*.tfrecord")

    # recipe geometry (egs/conf/wsj.conf: 24000; timit_tpu.conf: 28000)
    boundaries, batch_sizes = get_bucket_info(
        args.batch_frame, 1, 241, 10000, 150)

    base_rss = rss_mb()
    t0 = time.perf_counter()
    lazy = LazySpeechDataset(pattern, 123)
    scan_s = time.perf_counter() - t0
    print(json.dumps({
        "stage": "lazy_index_scan", "utts": len(lazy),
        "scan_s": round(scan_s, 1),
        "utt_per_s": round(len(lazy) / scan_s, 1),
        "index_rss_mb": rss_mb() - base_rss}), flush=True)

    loader = BucketedLoader(lazy, boundaries, batch_sizes, shuffle=True,
                            seed=3, drop_remainder=True, prefetch=2)
    loader.set_epoch(0)
    print(json.dumps({"stage": "lazy_epoch",
                      **epoch_through(loader, "lazy")}), flush=True)

    # 2-process lockstep planning cost at full scale (pure simulation —
    # exactly what each process runs per epoch in example-sharded mode)
    half = len(lazy) // 2
    peer_lens = [
        (lazy.inp_lens[:half], lazy.lab_lens[:half]),
        (lazy.inp_lens[half:], lazy.lab_lens[half:]),
    ]
    label_caps = loader.label_caps
    t0 = time.perf_counter()
    emissions = plan_lockstep_epoch(
        peer_lens, boundaries, [max(1, b // 2) for b in batch_sizes],
        label_caps, 3, 0, True)
    plan_s = time.perf_counter() - t0
    print(json.dumps({
        "stage": "lockstep_plan_2proc", "plan_s": round(plan_s, 2),
        "global_batches": len(emissions[0])}), flush=True)

    if not args.skip_eager:
        t0 = time.perf_counter()
        eager = SpeechDataset(pattern, 123)
        load_s = time.perf_counter() - t0
        print(json.dumps({
            "stage": "eager_load", "utts": len(eager),
            "load_s": round(load_s, 1),
            "peak_rss_mb": rss_mb()}), flush=True)
        eloader = BucketedLoader(eager, boundaries, batch_sizes,
                                 shuffle=True, seed=3,
                                 drop_remainder=True, prefetch=2)
        eloader.set_epoch(0)
        print(json.dumps({"stage": "eager_epoch",
                          **epoch_through(eloader, "eager")}), flush=True)

    if not args.keep and not args.skip_gen and args.pattern is None:
        shutil.rmtree(args.base)


if __name__ == "__main__":
    main()
