"""Tests for post-processing tools: log2utt, scorer, TIMIT mapping."""

import io

import numpy as np

from srf_tpu.utils.log2utt import ids_to_utt, parse_decode_log
from srf_tpu.utils.score import load_trn, score
from srf_tpu.utils.timit_map import PHONE_MAP, map_phones


def test_timit_mapping_drops_q_and_folds_closures():
    assert map_phones(["q"]) == []
    assert map_phones(["bcl", "b", "ix"]) == ["sil", "b", "ih"]
    assert len(PHONE_MAP) == 61


def test_parse_decode_log_two_line_format():
    log = io.StringIO(
        'noise\nUTTID: ["spk1-utt1"]\n'
        "SparseTensor(indices=[[0 0]\n"
        " [0 2]], values=[3 1 4], shape=[1 3])\n"
        'UTTID: ["spk1-utt2"]\n'
        "SparseTensor(indices=[[0 0]\n"
        " [0 0]], values=[5], shape=[1 1])\n"
    )
    parsed = dict(parse_decode_log(log))
    assert parsed == {"spk1-utt1": [3, 1, 4], "spk1-utt2": [5]}


def test_ids_to_utt_timit_and_wsj():
    timit_vocab = ["<PADDING_SYMBOL>", "aa", "bcl", "q", "iy"]
    assert ids_to_utt([1, 2, 3, 4], timit_vocab, "timit") == "aa sil iy"
    wsj_vocab = ["<PADDING_MASK>", "<SPACE>", "A", "B"]
    assert ids_to_utt([2, 1, 3, 3], wsj_vocab, "wsj") == "A BB"


def test_scorer_trn_files(tmp_path):
    ref = tmp_path / "ref.trn"
    hyp = tmp_path / "hyp.trn"
    ref.write_text("a b c (u1)\nd e (u2)\n")
    hyp.write_text("a b d (u1)\nd e (u2)\n")
    assert load_trn(str(ref)) == {"u1": ["a", "b", "c"], "u2": ["d", "e"]}
    out = io.StringIO()
    wer = score(str(ref), str(hyp), out)
    np.testing.assert_allclose(wer, 100.0 / 5)  # 1 sub / 5 ref tokens
    assert "20.00%" in out.getvalue()
