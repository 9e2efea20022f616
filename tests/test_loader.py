"""BucketedLoader unit tests: static shapes, bucketing, shuffling."""

import numpy as np

from srf_tpu.data.loader import BucketedLoader, EvalLoader


class FakeDataset:
    def __init__(self, lengths, feat_dim=4, label_len=3):
        rng = np.random.RandomState(0)
        self.feat_dim = feat_dim
        self.feats = [rng.randn(n, feat_dim).astype(np.float32) for n in lengths]
        self.labels = [
            rng.randint(1, 5, size=label_len).astype(np.int32) for _ in lengths
        ]
        self.utt_ids = None

    def __len__(self):
        return len(self.feats)


def test_static_shapes_per_bucket():
    ds = FakeDataset([5, 8, 10, 12, 18, 20, 19, 7, 9, 11])
    loader = BucketedLoader(ds, [10], [4, 2], shuffle=False, prefetch=0)
    shapes = set()
    for batch in loader:
        shapes.add(batch["feats"].shape)
        assert batch["feats"].shape[0] in (4, 2)
        # padding beyond each utterance's length is exactly zero
        for i in range(batch["feats"].shape[0]):
            n = batch["inp_len"][i]
            assert np.all(batch["feats"][i, n:] == 0)
    # bucket 0: 6 utts <= 10 -> one batch of 4 (2 dropped);
    # bucket 1: 4 utts > 10 -> two batches of 2
    assert len(shapes) == 2
    widths = sorted(s[1] for s in shapes)
    assert widths[0] == 10  # bucket boundary is the static width


def test_drop_remainder_and_epoch_shuffle():
    ds = FakeDataset([5] * 7)
    loader = BucketedLoader(ds, [10], [3, 1], shuffle=True, seed=1, prefetch=0)
    first = [b["inp_len"].copy() for b in loader]
    assert sum(b.shape[0] for b in first) == 6  # 7 -> two batches of 3
    second = [b["inp_len"].copy() for b in loader]
    assert sum(b.shape[0] for b in second) == 6


def test_eval_loader_pads_to_multiple():
    ds = FakeDataset([5, 129])
    ds.utt_ids = ["a", "b"]
    loader = EvalLoader(ds, batch_size=1, pad_multiple=128)
    batches = list(loader)
    assert batches[0]["feats"].shape[1] == 128
    assert batches[1]["feats"].shape[1] == 256
    assert batches[0]["utt_ids"] == ["a"]


def test_eval_loader_pad_last_keeps_batch_size():
    # 7 utts, batch 3: default reference fallback collapses to batch 1
    # (load_speech_data.py:127-145); pad_last keeps batch 3 and pads the
    # final batch with dummies that utt_ids/"valid" exclude
    ds = FakeDataset([5, 6, 7, 8, 9, 10, 11])
    ds.utt_ids = ["u%d" % i for i in range(7)]
    fallback = EvalLoader(ds, batch_size=3, pad_multiple=8)
    assert fallback.batch_size == 1

    loader = EvalLoader(ds, batch_size=3, pad_multiple=8, pad_last=True)
    batches = list(loader)
    assert [b["feats"].shape[0] for b in batches] == [3, 3, 3]
    assert batches[-1]["valid"] == 1
    assert batches[-1]["utt_ids"] == ["u6"]
    # dummy rows: 1 valid frame of zeros, real row unchanged
    np.testing.assert_array_equal(batches[-1]["inp_len"], [11, 1, 1])
    assert np.all(batches[-1]["feats"][1:] == 0)
    # real rows across batches cover the dataset in order
    seen = [u for b in batches for u in b["utt_ids"]]
    assert seen == ds.utt_ids


def test_prefetch_thread_yields_same_batches():
    ds = FakeDataset([5, 6, 7, 8, 9, 10])
    plain = BucketedLoader(ds, [12], [2, 1], shuffle=False, prefetch=0)
    threaded = BucketedLoader(ds, [12], [2, 1], shuffle=False, prefetch=2)
    a = [b["inp_len"] for b in plain]
    b = [b["inp_len"] for b in threaded]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def _fake_peer_lens(seed, sizes, max_len=40, max_lab=6):
    rng = np.random.RandomState(seed)
    return [
        (rng.randint(5, max_len + 1, size=n).astype(np.int64),
         rng.randint(1, max_lab + 1, size=n).astype(np.int64))
        for n in sizes
    ]


def test_plan_lockstep_identical_schedule_across_processes():
    from srf_tpu.data.loader import plan_lockstep_epoch

    peers = _fake_peer_lens(3, [17, 13, 20])
    boundaries, batch_sizes, caps = [15, 25], [4, 2, 2], [8, 13, 20]
    emissions = plan_lockstep_epoch(
        peers, boundaries, batch_sizes, caps, seed=7, epoch=2, shuffle=True,
    )
    # same length and same bucket sequence for every process
    seqs = [[b for b, _ in em] for em in emissions]
    assert seqs[0] == seqs[1] == seqs[2]
    assert len(seqs[0]) > 0
    for p, em in enumerate(emissions):
        used = []
        inp, lab = peers[p]
        for b, idxs in em:
            assert len(idxs) == batch_sizes[b]  # always full local batches
            for i in idxs:
                # each index used at most once per epoch, right bucket,
                # label under the static cap
                assert i not in used
                used.append(i)
                length = int(inp[i])
                want_b = 0 if length <= 15 else (1 if length <= 25 else 2)
                assert b == want_b
                assert int(lab[i]) <= caps[b]
    # deterministic: same (seed, epoch) -> same plan
    again = plan_lockstep_epoch(
        peers, boundaries, batch_sizes, caps, seed=7, epoch=2, shuffle=True,
    )
    assert again == emissions
    # different epoch -> different order (with overwhelming probability)
    other = plan_lockstep_epoch(
        peers, boundaries, batch_sizes, caps, seed=7, epoch=3, shuffle=True,
    )
    assert other != emissions


def test_plan_lockstep_starved_bucket_never_scheduled():
    from srf_tpu.data.loader import plan_lockstep_epoch

    # process 1 has no example longer than 15 -> bucket 1 starves globally
    peers = [
        (np.asarray([10, 20, 21, 9, 22, 23], np.int64),
         np.ones(6, np.int64)),
        (np.asarray([11, 12, 13, 14], np.int64), np.ones(4, np.int64)),
    ]
    emissions = plan_lockstep_epoch(
        peers, [15], [2, 2], [8, 11], seed=0, epoch=0, shuffle=False,
    )
    assert [b for b, _ in emissions[0]] == [0]
    assert [b for b, _ in emissions[1]] == [0]


def test_plan_lockstep_label_cap_skip_lowers_ready_count():
    from srf_tpu.data.loader import plan_lockstep_epoch

    # process 0 has 4 short examples but two labels exceed the cap: only
    # one batch of 2 is ready there, so only one is scheduled globally —
    # the old global-min-by-COUNT cap would have scheduled two and
    # deadlocked process 0
    peers = [
        (np.asarray([10, 10, 10, 10], np.int64),
         np.asarray([2, 9, 9, 2], np.int64)),
        (np.asarray([10, 10, 10, 10], np.int64),
         np.asarray([2, 2, 2, 2], np.int64)),
    ]
    emissions = plan_lockstep_epoch(
        peers, [], [2], [5], seed=0, epoch=0, shuffle=False,
    )
    assert len(emissions[0]) == 1 and len(emissions[1]) == 1
    assert emissions[0][0][1] == (0, 3)  # the two under-cap examples


# ----------------------------------------------------- lazy (out-of-core)


def _write_corpus_shards(tmp_path, n_utts, feat_dim=4, n_shards=3, seed=0,
                         min_len=5, max_len=24):
    """Round-robin TFRecord shards in the writer's exact schema
    (data/writer.py:157-165)."""
    from srf_tpu.data.example_proto import encode_example
    from srf_tpu.data.tfrecord import TFRecordWriter

    rng = np.random.RandomState(seed)
    writers = [
        TFRecordWriter(str(tmp_path / ("synth-train-%05d-of-%05d"
                                       % (i + 1, n_shards))))
        for i in range(n_shards)
    ]
    feats_all = []
    for i in range(n_utts):
        n = int(rng.randint(min_len, max_len + 1))
        feats = rng.randn(n, feat_dim).astype(np.float32)
        labels = rng.randint(1, 5, size=max(1, n // 8)).astype(np.int64)
        feats_all.append(feats)
        writers[i % n_shards].write(encode_example({
            "target_label": labels,
            "input_speech": feats.flatten(),
            "input_length": np.asarray([n], np.int64),
            "target_length": np.asarray([labels.size], np.int64),
            "utt_id": [("utt%05d" % i).encode()],
        }))
    for w in writers:
        w.close()
    return feats_all


def test_lazy_dataset_matches_eager(tmp_path):
    """LazySpeechDataset is a drop-in: identical batches from both loader
    paths (VERDICT r3 item 3 — out-of-core input pipeline)."""
    from srf_tpu.data.loader import LazySpeechDataset, SpeechDataset

    _write_corpus_shards(tmp_path, 37, feat_dim=4)
    ptrn = str(tmp_path / "synth-train-*")
    eager = SpeechDataset(ptrn, 4, with_utt_id=True)
    lazy = LazySpeechDataset(ptrn, 4, with_utt_id=True)
    assert len(eager) == len(lazy) == 37
    np.testing.assert_array_equal(eager.inp_lens, lazy.inp_lens)
    np.testing.assert_array_equal(eager.lab_lens, lazy.lab_lens)
    assert eager.utt_ids == lazy.utt_ids
    for i in range(len(eager)):
        np.testing.assert_array_equal(eager.feats[i], lazy.feats[i])
        np.testing.assert_array_equal(eager.labels[i], lazy.labels[i])

    for kw in (dict(shuffle=True, seed=3), dict(shuffle=False)):
        be = list(BucketedLoader(eager, [12], [4, 2], prefetch=2, **kw))
        bl = list(BucketedLoader(lazy, [12], [4, 2], prefetch=2, **kw))
        assert len(be) == len(bl) > 0
        for a, b in zip(be, bl):
            for k in ("feats", "labels", "inp_len", "tar_len"):
                np.testing.assert_array_equal(a[k], b[k])
    ee = list(EvalLoader(eager, batch_size=2, pad_multiple=8))
    el = list(EvalLoader(lazy, batch_size=2, pad_multiple=8))
    for a, b in zip(ee, el):
        np.testing.assert_array_equal(a["feats"], b["feats"])
        assert a["utt_ids"] == b["utt_ids"]


def test_lazy_dataset_filters_and_sharding(tmp_path):
    from srf_tpu.data.loader import LazySpeechDataset, SpeechDataset

    _write_corpus_shards(tmp_path, 24, feat_dim=4)
    ptrn = str(tmp_path / "synth-train-*")
    for kw in (dict(max_inp=15), dict(process_index=1, process_count=2)):
        eager = SpeechDataset(ptrn, 4, **kw)
        lazy = LazySpeechDataset(ptrn, 4, **kw)
        assert len(eager) == len(lazy)
        for i in range(len(eager)):
            np.testing.assert_array_equal(eager.feats[i], lazy.feats[i])


def test_lazy_dataset_scales_to_10k_utts(tmp_path):
    """Index-scan + full-epoch read-back at 10k utterances (small frames;
    the point is the span index and per-batch random reads, not bytes)."""
    from srf_tpu.data.loader import LazySpeechDataset

    n = 10_000
    _write_corpus_shards(tmp_path, n, feat_dim=4, n_shards=16,
                         min_len=5, max_len=12)
    ptrn = str(tmp_path / "synth-train-*")
    lazy = LazySpeechDataset(ptrn, 4)
    assert len(lazy) == n
    loader = BucketedLoader(lazy, [8], [64, 32], shuffle=True, seed=1,
                            prefetch=2)
    seen = 0
    checksum = 0.0
    for batch in loader:
        seen += batch["feats"].shape[0]
        checksum += float(batch["feats"].sum())
    assert seen > 0.9 * n  # drop_remainder loses < 10%
    assert np.isfinite(checksum)
