"""Dev harness: end-to-end learning check on the real chip.

Generates a learnable synthetic corpus (each 'phoneme' has a
characteristic feature direction), then drives the REAL pipeline:
save_tfrecord CLI -> trainer_sr CLI (canonical SRF architecture) ->
decode mode -> log2utt -> built-in PER scorer. Prints the final PER.

Run: python tools_dev/convergence_run.py [--epochs 40] [--utts 64]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_corpus(base, utts, vocab_size=20, frames=200, feat_dim=123,
                noise=0.3, variability=0.0, markov=0.0, proto_sim=0.0):
    """Learnable synthetic corpus; each 'phone' has a feature direction.

    ``variability`` > 0 makes the corpus realistic enough for
    augmentation to matter (the r2 SpecAugment check was neutral on the
    constant-direction corpus — masking was purely destructive there):
    per-utterance channel offsets (speaker/channel variation the model
    must become invariant to) and jittered phone durations. Scale ~0.5-1.

    ``markov`` > 0 draws phone sequences from a shared random Markov
    chain (Dirichlet concentration = ``markov``; smaller = peakier
    transitions) instead of uniform i.i.d. — uniform text carries zero
    LM-learnable structure, so this is what makes the shallow-fusion
    A/B meaningful.
    """
    rng = np.random.RandomState(0)
    chain = None
    if markov > 0:
        n_states = vocab_size - 1  # real phones 1..vocab_size-1
        chain = (
            rng.dirichlet([markov] * n_states),
            rng.dirichlet([markov] * n_states, size=n_states),
        )

    def sample_phones(n_ph):
        if chain is None:
            return rng.randint(1, vocab_size, size=n_ph)
        start, trans = chain
        out = [1 + rng.choice(n_states, p=start)]
        for _ in range(n_ph - 1):
            out.append(1 + rng.choice(n_states, p=trans[out[-1] - 1]))
        return np.asarray(out)
    tokens = ["<PADDING_SYMBOL>"] + ["p%02d" % i for i in range(1, vocab_size)] + ["$", "@"]
    with open(os.path.join(base, "synth.vocab"), "w") as f:
        f.write("\n".join(tokens) + "\n")
    # each phone: a random unit direction in feature space.
    # ``proto_sim`` in [0, 1) mixes in a shared direction so phones are
    # acoustically CONFUSABLE (cosine ~ proto_sim between any two) —
    # random directions in 123-d are near-orthogonal, which makes the
    # acoustics separable at any noise level and leaves an LM nothing to
    # fix; substitution-dominated regimes need correlated prototypes.
    protos = rng.randn(vocab_size + 2, feat_dim).astype(np.float32) * 2.0
    if proto_sim > 0:
        common = rng.randn(1, feat_dim).astype(np.float32) * 2.0
        protos = (
            np.sqrt(proto_sim) * common
            + np.sqrt(1.0 - proto_sim) * protos
        ).astype(np.float32)

    def gen(n, tag):
        specs = []
        for i in range(n):
            key = "%s%03d" % (tag, i)
            if variability > 0:
                n_ph = frames // 10
                phones = sample_phones(n_ph)
                durs = rng.randint(6, 15, size=n_ph)
                feats = np.repeat(protos[phones], durs, axis=0)
                # per-utterance channel/speaker offset: constant over time
                feats = feats + (
                    rng.randn(1, feat_dim).astype(np.float32)
                    * variability
                )
            else:
                n_ph = frames // 10
                phones = sample_phones(n_ph)
                feats = np.repeat(protos[phones], 10, axis=0)
            feats = feats + rng.randn(*feats.shape).astype(np.float32) * noise
            np.save(os.path.join(base, key + ".None.npy"),
                    feats.astype(np.float32))
            text = " ".join("p%02d" % p for p in phones)
            specs.append({"key": key + ".None.npy",
                          "duration": feats.shape[0] / 100.0,
                          "text": text})
        return specs

    for split, n in [("train", utts), ("valid", 16), ("test", 16)]:
        with open(os.path.join(base, split + ".json"), "w") as f:
            for spec in gen(n, split):
                f.write(json.dumps(spec) + "\n")


def run(args_list, log=None):
    print("+", " ".join(args_list[:6]), "...", flush=True)
    # keep the existing PYTHONPATH: /root/.axon_site's sitecustomize is how
    # the remote-TPU (axon) backend registers
    merged = os.pathsep.join(
        p for p in [REPO, os.environ.get("PYTHONPATH", "")] if p
    )
    env = dict(os.environ, PYTHONPATH=merged)
    out = subprocess.run(args_list, capture_output=True, text=True, env=env)
    if log:
        with open(log, "w") as f:
            f.write(out.stdout + "\n==== STDERR ====\n" + out.stderr)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit("command failed")
    return out.stdout


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--utts", type=int, default=64)
    parser.add_argument("--base", default="/tmp/srf_convergence")
    parser.add_argument("--model", default="srf",
                        choices=["srf", "stf", "lstm", "blstm", "cnn"])
    parser.add_argument("--keep", action="store_true")
    parser.add_argument("--noise", type=float, default=0.3,
                        help="corpus feature noise (higher = harder)")
    parser.add_argument("--variability", type=float, default=0.0,
                        help="per-utterance channel offsets + duration "
                             "jitter (realistic corpus for augmentation "
                             "A/Bs; try 0.5-1.0)")
    parser.add_argument("--mwer-epochs", type=int, default=0,
                        help="> 0: after CTC training, score, MWER "
                             "fine-tune this many epochs, score again")
    parser.add_argument("--proto-sim", type=float, default=0.0,
                        help="[0,1): cosine similarity between phone "
                             "prototypes — makes phones acoustically "
                             "confusable (substitution errors) so an LM "
                             "has something to disambiguate; try 0.9")
    parser.add_argument("--markov", type=float, default=0.0,
                        help="> 0: draw transcripts from a shared random "
                             "Markov chain (Dirichlet concentration; try "
                             "0.3) so text has LM-learnable structure")
    parser.add_argument("--lm-order", type=int, default=0,
                        help="> 0: train an n-gram LM on the training "
                             "transcripts and score a shallow-fusion "
                             "decode arm next to the acoustic-only one")
    parser.add_argument("--lm-weight", default="0.3",
                        help="comma list: each (weight, bonus) combo is a "
                             "decode arm on the SAME checkpoint")
    parser.add_argument("--lm-bonus", default="0.0", help="comma list")
    parser.add_argument("--extra", action="append", default=[],
                        help="extra trainer flags (repeatable), e.g. "
                             "--extra=--tpu-specaug=True")
    args = parser.parse_args()

    base = args.base
    if os.path.exists(base):
        shutil.rmtree(base)
    os.makedirs(base)
    make_corpus(base, args.utts, noise=args.noise,
                variability=args.variability, markov=args.markov,
                proto_sim=args.proto_sim)

    common = [
        "--path-base=%s" % base, "--path-vocab=synth.vocab",
        "--feat-dim=123", "--feat-type=None", "--prep-data-unit=bpe",
        "--path-train-ptrn=tfrecord/synth-train-None-123-*-of-*",
        "--path-valid-ptrn=tfrecord/synth-valid-None-123-*-of-*",
        "--path-test-ptrn=tfrecord/synth-test-None-123-*-of-*",
        "--path-ckpt=%s/ckpt" % base,
        "--train-batch-dynamic=False", "--train-batch-size=16",
        "--prep-data-num-train=%d" % args.utts,
        "--prep-data-num-valid=16", "--prep-data-num-test=16",
        "--decoding-beam-width=4",
    ]
    if args.model == "srf":
        # canonical SRF-TIMIT architecture (train_srf_timit.sh)
        common += [
            "--model-type=srf", "--model-caps-type=naive",
            "--model-caps-context=True", "--model-encoder-num=7",
            "--model-caps-primary-num=60", "--model-caps-primary-dim=8",
            "--model-caps-convolution-num=30",
            "--model-caps-convolution-dim=8",
            "--model-caps-class-dim=8", "--model-caps-iter=1",
            "--model-caps-window-lpad=1", "--model-caps-window-rpad=1",
            "--model-conv-layer-num=2", "--model-conv-filter-num=64",
        ]
    elif args.model == "stf":
        # compact Speech-Transformer (train_stf_timit.sh shape, fewer
        # layers so the check stays quick)
        common += [
            "--model-type=stf", "--model-encoder-num=6",
            "--model-dimension=128", "--model-inner-num=512",
            "--model-att-head-num=4",
            "--model-conv-layer-num=2", "--model-conv-filter-num=64",
        ]
    elif args.model in ("lstm", "blstm"):
        # compact BLSTM (train_lstm_wsj.sh shape: CNN-FE + blstm)
        common += [
            "--model-type=%s" % args.model, "--model-encoder-num=3",
            "--model-dimension=256", "--model-lstm-is-cnnfe=True",
            "--model-conv-layer-num=2", "--model-conv-filter-num=64",
        ]
    else:
        # compact maxout CNN, stride variant (train_cnn_wsj.sh shape)
        common += [
            "--model-type=cnn", "--model-conv-is-mp=False",
            "--model-encoder-num=6",
            "--model-conv-inp-nfilt=64", "--model-conv-inn-nfilt=128",
            "--model-conv-proj-num=3", "--model-conv-proj-dim=512",
            "--model-conv-layer-num=2", "--model-conv-filter-num=64",
        ]
    trainer = ("srf_tpu.trainer_tf" if args.model == "stf"
               else "srf_tpu.trainer_sr")
    run([sys.executable, "-m", "srf_tpu.tools.save_tfrecord",
         "--path-base=%s" % base, "--path-vocab=synth.vocab",
         "--feat-dim=123", "--feat-type=None", "--prep-data-name=synth",
         "--prep-data-shard=2",
         "--path-train-json=train.json", "--path-valid-json=valid.json",
         "--path-test-json=test.json", "--path-wrt-tfrecord=tfrecord",
         "--decoding-from-npy=True", "--prep-data-unit=bpe"],
        log=os.path.join(base, "tfr.log"))

    run([sys.executable, "-m", trainer] + common + [
        "--train-opti-type=adam", "--train-lr-param-k=0.002",
        "--train-max-epoch=%d" % args.epochs, "--train-es-tolerance=1000",
    ] + args.extra, log=os.path.join(base, "train.log"))
    for line in open(os.path.join(base, "train.log")):
        if "Train Loss" in line and ("001 " in line or
                                     "%03d " % args.epochs in line):
            print(line.strip(), flush=True)

    def decode_and_score(tag, decode_extra=()):
        # args.extra rides EVERY trainer invocation: --extra model-*
        # overrides change the architecture, and a decode without them
        # would rebuild the wrong model for the checkpoint
        decode_log = os.path.join(base, "decode%s.log" % tag)
        run([sys.executable, "-m", trainer] + common + [
            "--train-opti-type=adam", "--train-lr-param-k=0.001",
            "--train-max-epoch=0",
        ] + args.extra + list(decode_extra), log=decode_log)
        # scrape hypotheses and score (timit-style: space-joined tokens;
        # the 61->39 map passes unknown tokens through)
        hyp = run([sys.executable, "-m", "srf_tpu.utils.log2utt", decode_log,
                   os.path.join(base, "synth.vocab"), "--corpus", "timit"])
        with open(os.path.join(base, "hyp%s.utt" % tag), "w") as f:
            f.write(hyp)
        ref = run([sys.executable, "-m", "srf_tpu.tools.make_ref",
                   os.path.join(base, "tfrecord/synth-test-None-123-*"),
                   os.path.join(base, "synth.vocab"), "--corpus", "timit"])
        with open(os.path.join(base, "ref.utt"), "w") as f:
            f.write(ref)
        score = run([sys.executable, "-m", "srf_tpu.utils.score",
                     os.path.join(base, "ref.utt"),
                     os.path.join(base, "hyp%s.utt" % tag)])
        print("%s %s" % (tag or "final", score.strip()), flush=True)
        return score

    decode_and_score("")
    if args.lm_order > 0:
        # shallow-fusion A/B: same checkpoint, LM trained on the TRAIN
        # transcripts only, fused at decode time
        lm_path = os.path.join(base, "lm.npz")
        run([sys.executable, "-m", "srf_tpu.tools.train_ngram_lm",
             "--tpu-lm-out", lm_path, "--tpu-lm-order=%d" % args.lm_order,
             "--path-base=%s" % base, "--path-vocab=synth.vocab",
             "--path-train-json=train.json", "--prep-data-unit=bpe"],
            log=os.path.join(base, "lm.log"))
        for weight in args.lm_weight.split(","):
            for bonus in args.lm_bonus.split(","):
                decode_and_score("_lm_w%s_b%s" % (weight, bonus), [
                    "--tpu-lm-path=%s" % lm_path,
                    "--tpu-lm-weight=%s" % weight,
                    "--tpu-lm-bonus=%s" % bonus,
                ])
    # trained with an EMA? also score the EMA weights (raw-vs-EMA A/B)
    ema_flags = [e for e in args.extra if e.startswith("--tpu-ema-decay")]
    if ema_flags:
        decode_and_score("_ema", ema_flags + ["--tpu-decode-ema=True"])
    if args.mwer_epochs > 0:
        # MWER fine-tune from the CTC checkpoint, then re-score
        run([sys.executable, "-m", trainer] + common + [
            "--train-opti-type=adam", "--train-lr-param-k=0.0003",
            "--train-max-epoch=%d" % (args.epochs + args.mwer_epochs),
            "--train-es-tolerance=1000", "--train-is-mwer=True",
            "--tpu-mwer-nbest=4", "--tpu-mwer-lam-ctc=0.1",
        ], log=os.path.join(base, "mwer.log"))
        decode_and_score("_mwer")
    if not args.keep:
        pass  # leave artifacts for inspection


if __name__ == "__main__":
    main()
