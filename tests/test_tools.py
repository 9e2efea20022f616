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


def test_ark_to_npy_roundtrip_through_writer_and_loader(tmp_path):
    """Kaldi text-ark -> npy (tools/ark_to_npy.py, the published feature
    protocol's import path, reference: egs/script/parsing.py) must feed the
    TFRecord writer CLI and come back unchanged through the loader."""
    import json

    from srf_tpu.data.loader import SpeechDataset
    from srf_tpu.tools.ark_to_npy import convert, parse_ark
    from srf_tpu.tools.save_tfrecord import main as save_main

    rng = np.random.RandomState(0)
    utts = {"spk1_utt1": rng.randn(7, 5), "spk2_utt2": rng.randn(4, 5)}
    ark = tmp_path / "feats.txt"
    with open(ark, "w") as fh:
        for utt_id, feats in utts.items():
            fh.write("%s  [\n" % utt_id)
            for i, row in enumerate(feats):
                tail = " ]" if i == len(feats) - 1 else ""
                fh.write("  " + " ".join("%.7f" % v for v in row) + tail + "\n")
    # parse: exact values, float32
    parsed = dict(parse_ark(open(ark)))
    assert set(parsed) == set(utts)
    for utt_id in utts:
        np.testing.assert_allclose(
            parsed[utt_id], utts[utt_id].astype(np.float32), atol=1e-6
        )
    assert convert(str(ark), str(tmp_path)) == 2

    manifest = tmp_path / "train.json"
    with open(manifest, "w") as fh:
        for utt_id, feats in utts.items():
            fh.write(json.dumps({
                "key": utt_id + ".npy", "duration": feats.shape[0] / 100.0,
                "text": "a b",
            }) + "\n")
    (tmp_path / "v.vocab").write_text(
        "<PADDING_SYMBOL>\na\nb\n<SPACE>\n$\n@\n"
    )
    save_main([
        "save_tfrecord",
        "--path-base=%s" % tmp_path, "--path-vocab=v.vocab",
        "--feat-dim=5", "--feat-type=None", "--prep-data-name=synth",
        "--prep-data-shard=1", "--path-train-json=train.json",
        "--path-wrt-tfrecord=tfr", "--decoding-from-npy=True",
    ])
    ds = SpeechDataset(str(tmp_path / "tfr" / "*train*"), feat_dim=5)
    assert len(ds) == 2
    by_len = {f.shape[0]: f for f in ds.feats}
    np.testing.assert_allclose(
        by_len[7], utts["spk1_utt1"].astype(np.float32), atol=1e-6
    )


def test_align_tokens_ops():
    from srf_tpu.utils.edit_distance import align_tokens

    ops = align_tokens(["a", "b", "c"], ["a", "x", "c", "d"])
    assert ops == [
        ("C", "a", "a"), ("S", "b", "x"), ("C", "c", "c"), ("I", None, "d")
    ]
    # deletion + empty-hyp edge
    assert align_tokens(["a"], []) == [("D", "a", None)]
    assert align_tokens([], ["z"]) == [("I", None, "z")]
    # error count always equals the plain edit distance
    from srf_tpu.utils.edit_distance import levenshtein

    cases = [(["a", "b", "a"], ["b", "a", "b"]),
             (["x"] * 4, ["x", "y", "x"]), ([], [])]
    for ref, hyp in cases:
        ops = align_tokens(ref, hyp)
        errs = sum(1 for op, _, _ in ops if op != "C")
        assert errs == levenshtein(ref, hyp)


def test_scorer_breakdown_pralign_confusions(tmp_path):
    ref = tmp_path / "ref.trn"
    hyp = tmp_path / "hyp.trn"
    ref.write_text("a b c (u1)\nd e (u2)\nf g (u3)\n")
    hyp.write_text("a x c q (u1)\nd e (u2)\n")  # u3 missing -> 2 dels
    out = io.StringIO()
    align_path = tmp_path / "align.txt"
    wer = score(str(ref), str(hyp), out,
                pralign_path=str(align_path), confusions=5)
    # errors: 1 sub + 1 ins (u1) + 2 del (u3) over 7 ref tokens
    np.testing.assert_allclose(wer, 100.0 * 4 / 7)
    text = out.getvalue()
    assert "S=1" in text and "D=2" in text and "I=1" in text
    assert "a -> x" not in text  # confusion lists ref->hyp of the sub
    assert "b -> x x 1" in text
    assert "Top deletions: f x 1, g x 1" in text
    assert "Top insertions: q x 1" in text
    align = align_path.read_text()
    assert "id: (u1)" in align and "id: (u3)" in align
    assert "REF: a B C q" not in align  # correct tokens stay lowercase
    assert "B" in align and "X" in align and "***" in align


def test_make_vocab_roundtrip(tmp_path):
    """make_vocab emits the loader's expected format: PAD first, '$'/'@'
    last, frequency-major symbols; load_vocab accepts it."""
    import json

    from srf_tpu.config.logger import Logger
    from srf_tpu.tools.make_vocab import main as make_vocab_main
    from srf_tpu.utils.vocab import load_vocab

    manifest = tmp_path / "train.json"
    with open(manifest, "w") as f:
        for text in ("abc ab", "bb", "cab a"):
            f.write(json.dumps({"key": "k", "duration": 1.0,
                                "text": text}) + "\n")
    out = tmp_path / "auto.vocab"
    assert make_vocab_main([str(out), str(manifest)]) == 0
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "<PADDING_SYMBOL>"
    assert lines[-2:] == ["$", "@"]
    # b(4) > a(3) > c(2) > <SPACE>(2): freq major, alphabetical tiebreak
    assert lines[1:-2] == ["b", "a", "<SPACE>", "c"]
    logger = Logger(name="mv", level=Logger.INFO).logger
    _, vocab, dim, _ = load_vocab(str(out), logger)
    assert dim == len(lines)
    # min-count filter drops rare symbols
    assert make_vocab_main([str(out), str(manifest),
                            "--min-count=3"]) == 0
    lines = out.read_text().strip().split("\n")
    assert lines[1:-2] == ["b", "a"]


def test_ckpt_info_reports_tree(tmp_path):
    """ckpt_info describes a checkpoint without the model that wrote it."""
    import io

    import numpy as np

    from srf_tpu.tools.ckpt_info import describe
    from srf_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, {
        "step": np.asarray(3, np.int32),
        "params": {"w": np.zeros((4, 5), np.float32),
                   "b": np.zeros((5,), np.float32)},
        "ema_params": {"w": np.zeros((4, 5), np.float32)},
    })
    mgr.close()
    buf = io.StringIO()
    assert describe(str(tmp_path / "ckpt"), full=True, out=buf) == 0
    text = buf.getvalue()
    assert "steps on disk:  3" in text
    assert "params" in text and "25 params" in text
    assert "present (serve with --tpu-decode-ema)" in text
    assert "4x5" in text
