"""Full-scale TIMIT dress rehearsal on a synthetic corpus (VERDICT r4 #3).

The real corpora are absent from this environment, so accuracy parity is
blocked — but the RECIPE can be rehearsed at exact TIMIT geometry
(train/valid/test = 3,696/400/192 utterances, reference:
egs/conf/timit.conf:21-23) with a learnable synthetic corpus over the real
61-phone vocab, giving (a) per-stage wall-clock for the whole composed
pipeline on chip and (b) statistically powered A/Bs: at ~7,000 reference
phone tokens per decode split, a binomial 95% CI on PER is ~±0.3% at
PER 1-2%, which resolves the 3x relative differences the 320-utt smoke
corpus could not (its noise band was 2 errors ≈ 0.6% absolute).

Subcommands:

  corpus   generate npy feats + manifests (TIMIT-like duration
           distribution, 10 phones/s proto features), write TFRecords
           with the conf-pinned shard names, derive 61->39-mapped refs.
  run      the real driver egs/script/train_srf_timit.sh end-to-end with
           canonical args (L7 PH60 CH30 D8 SDR, staged 0.5 -> 0.1 LR,
           avg-10, decode test+dev, score), each stage timed -> JSON.
  ab       one A/B arm: fixed-budget train -> avg-10 -> decode test+dev
           -> PER with binomial CI, as JSON. --extra/--tag/--seed define
           the arm (e.g. --extra='--tpu-bf16=True' --tag stf_bf16).
  report   two-proportion z-test between two ab JSON outputs.

Run on the chip (default JAX_PLATFORMS); corpus/report are host-only.
"""

import argparse
import glob
import json
import math
import os
import re
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB = os.path.join(REPO, "egs/data/timit_62.vocab")
DEFAULT_OUT = "/tmp/timit_dress"

# canonical recipe dataset sizes (reference: egs/conf/timit.conf:21-23)
SPLITS = [("train", 3696), ("valid", 400), ("test", 192)]


def make_corpus(base, noise=0.3, seed=0):
    """Learnable synthetic TIMIT at exact corpus geometry.

    Durations ~ lognormal fit to TIMIT (mean ~3.1 s, clipped 1.1-7.8 s);
    10 phones/s, each phone a characteristic 123-dim direction + noise
    (the convergence_run/driver_e2e recipe, scaled up)."""
    rng = np.random.RandomState(seed)
    tokens = [line.rstrip("\n") for line in open(VOCAB)]
    usable = [i for i, t in enumerate(tokens) if i > 0 and t not in ("$", "@")]
    protos = rng.randn(len(tokens), 123).astype(np.float32) * 2.0
    os.makedirs(base, exist_ok=True)
    for split, n in SPLITS:
        frames_all = np.clip(
            rng.lognormal(mean=np.log(300.0), sigma=0.28, size=n),
            110, 780,
        ).astype(int)
        with open(os.path.join(base, split + ".json"), "w") as f:
            for i in range(n):
                frames = int(frames_all[i])
                # spk_utt key shape for the writer's TIMIT id parsing
                key = "%s%03d_%04d.npy" % (split[:2], i % 462, i)
                n_ph = max(2, frames // 10)
                ids = rng.choice(usable, size=n_ph)
                feats = np.repeat(protos[ids], 10, axis=0)[:frames]
                feats = feats + rng.randn(*feats.shape).astype(np.float32) * noise
                np.save(os.path.join(base, key), feats.astype(np.float32))
                f.write(json.dumps({
                    "key": key, "duration": frames / 100.0,
                    "text": " ".join(tokens[p] for p in ids),
                }) + "\n")
        print("%s: %d utts, %.0f frames mean" % (split, n, frames_all.mean()),
              flush=True)


def run_cmd(cmd, env=None, log=None):
    t0 = time.time()
    print("+ %s" % " ".join(cmd[:4]), flush=True)
    merged = os.pathsep.join(
        p for p in [REPO, os.environ.get("PYTHONPATH", "")] if p)
    full_env = dict(os.environ, PYTHONPATH=merged)
    if env:
        full_env.update(env)
    out = subprocess.run(cmd, capture_output=True, text=True, env=full_env,
                         cwd=REPO)
    if log:
        with open(log, "w") as f:
            f.write(out.stdout + "\n==== STDERR ====\n" + out.stderr)
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise SystemExit("command failed: %s" % " ".join(cmd[:4]))
    return out.stdout, time.time() - t0


def write_tfrecords(base):
    _, dt = run_cmd([
        sys.executable, "-m", "srf_tpu.tools.save_tfrecord",
        "--path-base=%s" % base, "--path-vocab=%s" % VOCAB,
        "--feat-dim=123", "--feat-type=None",
        "--prep-data-name=timit", "--prep-data-shard=10",
        "--path-train-json=train.json", "--path-valid-json=valid.json",
        "--path-test-json=test.json",
        "--path-wrt-tfrecord=tfrecord_graves13",
        "--decoding-from-npy=True", "--prep-data-unit=word",
    ], log=os.path.join(base, "tfr.log"))
    for split, ref in [("test", "test.ref"), ("valid", "valid.ref")]:
        ptrn = os.path.join(base, "tfrecord_graves13",
                            "timit-%s-None-123-*" % split)
        txt, _ = run_cmd([sys.executable, "-m", "srf_tpu.tools.make_ref",
                          ptrn, VOCAB, "--corpus", "timit"])
        with open(os.path.join(base, ref), "w") as f:
            f.write(txt)
    print("tfrecords + refs written (%.0f s)" % dt, flush=True)


def parse_score(text):
    """errors/tokens + PER + binomial 95% CI from utils.score output."""
    m = re.search(r"Error Rate: ([\d.]+)% \((\d+) errors / (\d+) tokens\)",
                  text)
    if not m:
        return None
    errs, toks = int(m.group(2)), int(m.group(3))
    p = errs / max(toks, 1)
    half = 1.96 * math.sqrt(max(p * (1 - p), 1e-12) / max(toks, 1))
    return {"per": round(100 * p, 3), "errors": errs, "tokens": toks,
            "ci95": round(100 * half, 3)}


def score_decode_log(base, log_path, ref_name, tag):
    utt_path = log_path.replace(".out", ".utt")
    txt, _ = run_cmd([sys.executable, "-m", "srf_tpu.utils.log2utt",
                      log_path, VOCAB, "--corpus", "timit"])
    with open(utt_path, "w") as f:
        f.write(txt)
    out, _ = run_cmd([sys.executable, "-m", "srf_tpu.utils.score",
                      os.path.join(base, ref_name), utt_path])
    res = parse_score(out)
    print("  %s: PER %.2f%% ± %.2f (%d/%d)" % (
        tag, res["per"], res["ci95"], res["errors"], res["tokens"]),
        flush=True)
    return res


def rehearsal_run(base, out, e1, e2):
    """The real shell driver, canonical args, staged LR — per-stage wall
    clock comes from the driver logs' own boundaries, so run it whole."""
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    env = {
        "DATA_BASE": base, "OUT_BASE": out,
        "CKPT_BASE": os.path.join(out, "checkpoint"), "REF_DIR": base,
        "E1": str(e1), "E2": str(e2),
    }
    t0 = time.time()
    _, dt = run_cmd(["bash", "egs/script/train_srf_timit.sh"], env=env,
                    log=os.path.join(out, "driver.log"))
    name = "SRF_L7_PH60-PD8-CH30-CD8-VD8_W-1-1_SDR-I1"
    stages = {}
    for stage, suffix in [("train", ".1train.out"), ("avg", ".2avg.out"),
                          ("decode_test", ".3decode.test.out"),
                          ("decode_valid", ".3decode.valid.out")]:
        path = os.path.join(out, name + suffix)
        if os.path.exists(path):
            stages[stage + "_mtime"] = os.path.getmtime(path) - t0
    result = {"driver_wall_s": round(dt, 1), "e1": e1, "e2": e2,
              "stage_end_offsets_s": {k: round(v, 1)
                                      for k, v in stages.items()}}
    for tc, ref in [("test", "test.ref"), ("valid", "valid.ref")]:
        log_path = os.path.join(out, "%s.3decode.%s.out" % (name, tc))
        result[tc] = score_decode_log(base, log_path, ref, tc)
    with open(os.path.join(out, "rehearsal.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    return result


FAMILIES = {
    # canonical recipe args per family (TIMIT drivers)
    "srf": {
        "module": "srf_tpu.trainer_sr",
        "flags": [
            "--model-type=srf", "--model-caps-type=naive",
            "--model-caps-context=True", "--model-caps-iter=1",
            "--model-encoder-num=7", "--model-caps-primary-num=60",
            "--model-caps-convolution-num=30", "--model-caps-primary-dim=8",
            "--model-caps-convolution-dim=8", "--model-caps-class-dim=8",
            "--model-caps-window-lpad=1", "--model-caps-window-rpad=1",
        ],
    },
    "stf": {
        "module": "srf_tpu.trainer_tf",
        "flags": [
            "--model-encoder-num=20", "--model-dimension=128",
            "--model-inner-num=1024", "--model-att-head-num=4",
            "--model-conv-layer-num=2", "--model-conv-filter-num=64",
        ],
    },
    "cnn": {
        "module": "srf_tpu.trainer_sr",
        "flags": [
            "--model-type=cnn", "--model-conv-is-mp=True",
            "--model-encoder-num=10", "--model-conv-inp-nfilt=128",
            "--model-conv-inn-nfilt=256", "--model-conv-proj-num=3",
            "--model-conv-proj-dim=1024", "--model-conv-stride=1",
        ],
    },
    # canonical BLSTM geometry (reference: egs/script/train_lstm_wsj.sh:5-9)
    # driven at TIMIT scale for the bf16 convergence A/B
    "lstm": {
        "module": "srf_tpu.trainer_sr",
        "flags": [
            "--model-type=blstm", "--model-lstm-is-cnnfe=True",
            "--model-encoder-num=5", "--model-dimension=534",
        ],
    },
}


def ab_arm(base, out, family, tag, epochs, seed, k, warmup, batch_frame,
           extra, avg_num=10):
    """One fixed-budget arm: train -> avg -> decode test+dev -> PER+CI."""
    spec = FAMILIES[family]
    arm_dir = os.path.join(out, "%s_seed%d" % (tag, seed))
    if os.path.exists(arm_dir):
        shutil.rmtree(arm_dir)
    os.makedirs(arm_dir)
    ckpt = os.path.join(arm_dir, "ckpt")
    common = [
        "--path-base=%s" % base, "--config=egs/conf/timit.conf",
        "--path-ckpt=%s" % ckpt,
        "--train-batch-frame=%d" % batch_frame,
        "--train-warmup-n=%d" % warmup,
        "--train-lr-param-k=%g" % k,
        "--tpu-seed=%d" % seed,
        "--model-average-num=%d" % avg_num,
    ] + spec["flags"] + (extra.split() if extra else [])
    result = {"tag": tag, "family": family, "seed": seed, "epochs": epochs,
              "k": k, "warmup": warmup, "batch_frame": batch_frame,
              "extra": extra}
    _, dt = run_cmd(
        [sys.executable, "-u", "-m", spec["module"]] + common + [
            "--train-max-epoch=%d" % epochs,
            "--train-es-tolerance=%d" % epochs,
        ], log=os.path.join(arm_dir, "train.log"))
    result["train_wall_s"] = round(dt, 1)
    _, dt = run_cmd(
        [sys.executable, "-u", "-m", "srf_tpu.tools.average_ckpt"] + common
        + ["--train-max-epoch=0"],
        log=os.path.join(arm_dir, "avg.log"))
    result["avg_wall_s"] = round(dt, 1)
    for tc, ptrn, ref in [
        ("test", "tfrecord_graves13/timit-test-None-123-*-of-*", "test.ref"),
        ("valid", "tfrecord_graves13/timit-valid-None-123-*-of-*",
         "valid.ref"),
    ]:
        log_path = os.path.join(arm_dir, "decode.%s.out" % tc)
        stdout, dt = run_cmd(
            [sys.executable, "-u", "-m", spec["module"]] + common + [
                "--train-max-epoch=0", "--path-ckpt=%s/avg" % ckpt,
                "--path-test-ptrn=%s" % ptrn,
            ])
        with open(log_path, "w") as f:
            f.write(stdout)
        result["decode_%s_wall_s" % tc] = round(dt, 1)
        result[tc] = score_decode_log(base, log_path, ref, "%s %s" % (tag, tc))
    with open(os.path.join(arm_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    return result


def report(path_a, path_b):
    """Two-proportion z-test on test-split PER between two ab arms."""
    a = json.load(open(path_a))
    b = json.load(open(path_b))
    ea, na = a["test"]["errors"], a["test"]["tokens"]
    eb, nb = b["test"]["errors"], b["test"]["tokens"]
    p_pool = (ea + eb) / (na + nb)
    se = math.sqrt(max(p_pool * (1 - p_pool), 1e-12) * (1 / na + 1 / nb))
    z = (ea / na - eb / nb) / max(se, 1e-12)
    print(json.dumps({
        "a": {"tag": a["tag"], "per": a["test"]["per"],
              "ci95": a["test"]["ci95"]},
        "b": {"tag": b["tag"], "per": b["test"]["per"],
              "ci95": b["test"]["ci95"]},
        "z": round(z, 2),
        "significant_95": abs(z) > 1.96,
    }))


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("corpus")
    p.add_argument("--base", default=DEFAULT_OUT)
    p = sub.add_parser("run")
    p.add_argument("--base", default=DEFAULT_OUT)
    p.add_argument("--out", default=DEFAULT_OUT + "_run")
    p.add_argument("--e1", type=int, default=27)
    p.add_argument("--e2", type=int, default=200)
    p = sub.add_parser("ab")
    p.add_argument("--base", default=DEFAULT_OUT)
    p.add_argument("--out", default=DEFAULT_OUT + "_ab")
    p.add_argument("--family", default="srf", choices=sorted(FAMILIES))
    p.add_argument("--tag", required=True)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--k", type=float, default=0.5)
    p.add_argument("--warmup", type=int, default=1200)
    p.add_argument("--batch-frame", type=int, default=7000)
    p.add_argument("--extra", default="")
    p = sub.add_parser("report")
    p.add_argument("a")
    p.add_argument("b")
    args = parser.parse_args()

    if args.cmd == "corpus":
        make_corpus(args.base)
        write_tfrecords(args.base)
    elif args.cmd == "run":
        rehearsal_run(args.base, args.out, args.e1, args.e2)
    elif args.cmd == "ab":
        ab_arm(args.base, args.out, args.family, args.tag, args.epochs,
               args.seed, args.k, args.warmup, args.batch_frame, args.extra)
    else:
        report(args.a, args.b)


if __name__ == "__main__":
    main()
