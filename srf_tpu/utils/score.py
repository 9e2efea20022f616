"""In-framework scorer for trn-format hypothesis/reference files.

Computes WER/PER over sclite "trn" files (``tokens ... (utt_id)`` lines,
the format log2utt emits and sclite consumes) so scoring works without the
external NIST binary. Word-level edit distance matches sclite's counts.

CLI:
    python -m srf_tpu.utils.score <ref.trn> <hyp.trn>
"""

import re
import sys

from srf_tpu.utils.edit_distance import wer_tokens

_TRN_RE = re.compile(r"^(.*)\(([^()]+)\)\s*$")


def load_trn(path):
    utts = {}
    with open(path) as f:
        for line in f:
            match = _TRN_RE.match(line.strip())
            if match:
                text, utt_id = match.group(1).strip(), match.group(2).strip()
                utts[utt_id] = text.split() if text else []
    return utts


def score(ref_path, hyp_path, out=sys.stdout):
    refs = load_trn(ref_path)
    hyps = load_trn(hyp_path)
    total_err = 0
    total_words = 0
    missing = 0
    for utt_id, ref_tokens in refs.items():
        hyp_tokens = hyps.get(utt_id)
        if hyp_tokens is None:
            # sclite scores every reference utterance: a missing
            # hypothesis is all deletions, not an exclusion (excluding
            # it would let a half-crashed decode report a BETTER rate
            # than a complete one)
            missing += 1
            total_err += len(ref_tokens)
            total_words += len(ref_tokens)
            continue
        err, n = wer_tokens(hyp_tokens, ref_tokens)
        total_err += err
        total_words += n
    wer = 100.0 * total_err / max(total_words, 1)
    out.write(
        "Utterances scored: %d (missing hyp: %d)\n"
        % (len(refs) - missing, missing)
    )
    out.write(
        "Word/Token Error Rate: %.2f%% (%d errors / %d tokens)\n"
        % (wer, total_err, total_words)
    )
    return wer


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) != 2:
        print("usage: python -m srf_tpu.utils.score <ref.trn> <hyp.trn>")
        return 1
    score(argv[0], argv[1])
    return 0


if __name__ == "__main__":
    sys.exit(main())
