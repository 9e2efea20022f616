"""WER port validated against the reference's embedded fixture.

The fixture ids/expected WERs come from the reference's self-test
(reference: tfsr/helper/train_helper.py:423-472, expected [0.111, 0.105]).
The vocab file it used (samples/data/stf.vocab) is not in the repo; the
reconstruction below (pad 'p', A-Z at 1-26, <SPACE> at 29, '$' EOS at 31)
is validated by reproducing the expected WERs exactly.
"""

import numpy as np

from srf_tpu.utils.edit_distance import assemble_to_words, compute_wer

VOCAB = (
    ["p"]
    + [chr(ord("A") + i) for i in range(26)]  # ids 1..26
    + ["<unk>", "<EOS>", " ", "n", "$"]       # ids 27..31
)

Y_PREDS = [
    [29, 20, 8, 5, 29, 8, 9, 19, 20, 15, 18, 25, 29, 15, 6, 29, 15, 20, 8, 5,
     18, 29, 1, 6, 18, 9, 3, 1, 14, 29, 14, 1, 20, 9, 15, 14, 19, 29, 9, 19,
     29, 14, 25, 29, 7, 21, 9, 4, 5, 29, 23, 8, 9, 20, 5, 19, 29, 9, 14, 4, 9,
     1, 14, 19, 29, 1, 14, 4, 29, 19, 13, 1, 12, 12, 29, 2, 12, 1, 3, 11, 29,
     20, 18, 9, 5, 29, 19, 8, 15, 21, 12, 4, 29, 6, 5, 1, 18, 29, 31] + [0] * 46,
    [21, 20, 21, 18, 5, 19, 29, 23, 5, 18, 5, 29, 19, 21, 16, 16, 15, 18, 20,
     5, 4, 29, 2, 25, 29, 3, 15, 14, 3, 5, 18, 14, 29, 20, 8, 1, 20, 29, 23,
     8, 5, 1, 20, 29, 13, 1, 25, 29, 2, 5, 29, 22, 15, 12, 21, 14, 5, 18, 1,
     2, 12, 5, 29, 9, 6, 29, 3, 15, 12, 4, 29, 19, 14, 1, 16, 19, 29, 22, 15,
     12, 1, 20, 9, 19, 29, 16, 1, 19, 20, 29, 23, 5, 5, 11, 5, 14, 4, 19, 29,
     23, 1, 18, 14, 20, 8, 29, 1, 14, 1, 12, 25, 19, 20, 19, 29, 19, 1, 9, 4,
     29, 31] + [0] * 24,
]

TARGETS = [
    [6, 29, 20, 8, 5, 29, 8, 9, 19, 20, 15, 18, 25, 29, 15, 6, 29, 15, 20, 8,
     5, 18, 29, 1, 6, 18, 9, 3, 1, 14, 29, 14, 1, 20, 9, 15, 14, 19, 29, 9,
     19, 29, 1, 14, 25, 29, 7, 21, 9, 4, 5, 29, 23, 8, 9, 20, 5, 19, 29, 9,
     14, 4, 9, 1, 14, 19, 29, 1, 14, 4, 29, 19, 13, 1, 12, 12, 29, 2, 12, 1,
     3, 11, 29, 20, 18, 9, 5, 29, 19, 8, 15, 21, 12, 4, 29, 6, 5, 1, 18, 29,
     31] + [0] * 29,
    [6, 21, 20, 21, 18, 5, 19, 29, 23, 18, 5, 29, 19, 21, 16, 16, 15, 18, 20,
     5, 4, 29, 2, 25, 29, 3, 15, 14, 3, 5, 18, 14, 29, 20, 8, 1, 20, 29, 23,
     8, 5, 1, 20, 29, 13, 1, 25, 29, 2, 5, 29, 22, 15, 12, 21, 14, 5, 18, 1,
     2, 12, 5, 29, 9, 6, 29, 3, 15, 12, 4, 29, 19, 14, 1, 16, 19, 29, 22, 15,
     12, 1, 20, 9, 19, 29, 16, 1, 19, 20, 29, 23, 5, 5, 11, 5, 14, 4, 19, 29,
     23, 1, 18, 14, 20, 8, 29, 1, 14, 1, 12, 25, 19, 20, 19, 29, 19, 1, 9, 4,
     29, 31] + [0] * 14,
]


def _pad(rows):
    width = max(len(r) for r in rows)
    return np.array([r + [0] * (width - len(r)) for r in rows])


def test_reference_wer_fixture():
    errs, words = compute_wer(_pad(Y_PREDS), _pad(TARGETS), VOCAB)
    wers = np.round(errs / words * 1000) / 1000
    np.testing.assert_allclose(wers, [0.111, 0.105])


def test_assemble_cleanup_chain():
    # '@ ' bos-space, trailing ' $' eos, 'p' pad, double blanks
    vocab = ["p", "@", "$", " ", "A", "B", "n"]
    ids = [1, 3, 4, 3, 3, 5, 3, 2, 0, 0]  # "@ A  B $pp" -> "A B"
    assert assemble_to_words(ids, vocab) == ["A", "B"]
