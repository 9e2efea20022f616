"""Golden tests for the clean-room TFRecord + Example codec against TF."""

import os

import numpy as np
import pytest

from srf_tpu.data import example_proto, tfrecord

tf = pytest.importorskip("tensorflow")


def _tf_example(feats, labels, utt_id):
    return tf.train.Example(
        features=tf.train.Features(
            feature={
                "target_label": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=labels)
                ),
                "input_speech": tf.train.Feature(
                    float_list=tf.train.FloatList(value=feats.flatten())
                ),
                "input_length": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[feats.shape[0]])
                ),
                "target_length": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[len(labels)])
                ),
                "utt_id": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[utt_id.encode()])
                ),
            }
        )
    ).SerializeToString()


def test_decode_tf_encoded_example():
    rng = np.random.RandomState(0)
    feats = rng.randn(17, 5).astype(np.float32)
    labels = [3, 1, 4, 1, 5]
    serialized = _tf_example(feats, labels, "spk-utt0")
    decoded = example_proto.decode_example(serialized)
    np.testing.assert_allclose(decoded["input_speech"], feats.flatten())
    np.testing.assert_array_equal(decoded["target_label"], labels)
    assert decoded["input_length"][0] == 17
    assert decoded["target_length"][0] == 5
    assert decoded["utt_id"][0] == b"spk-utt0"


def test_tf_decodes_our_encoded_example():
    rng = np.random.RandomState(1)
    feats = rng.randn(9, 4).astype(np.float32)
    labels = np.array([7, 2, 9], dtype=np.int64)
    ours = example_proto.encode_example(
        {
            "target_label": labels,
            "input_speech": feats.flatten(),
            "input_length": np.array([9], np.int64),
            "target_length": np.array([3], np.int64),
            "utt_id": [b"u1"],
        }
    )
    ex = tf.train.Example.FromString(ours)
    got = ex.features.feature
    np.testing.assert_allclose(
        np.array(got["input_speech"].float_list.value, np.float32), feats.flatten()
    )
    np.testing.assert_array_equal(got["target_label"].int64_list.value, labels)
    assert got["utt_id"].bytes_list.value[0] == b"u1"


def test_roundtrip_our_codec():
    feats = np.arange(12, dtype=np.float32)
    ours = example_proto.encode_example({"x": feats, "n": np.array([3]), "s": [b"ab"]})
    back = example_proto.decode_example(ours)
    np.testing.assert_allclose(back["x"], feats)
    assert back["n"][0] == 3
    assert back["s"] == [b"ab"]


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8a9136aa
    assert tfrecord.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tfrecord.crc32c(b"123456789") == 0xE3069283


def test_tfrecord_file_read_by_tf(tmp_path):
    path = os.path.join(tmp_path, "shard-0")
    payloads = [b"hello", b"world" * 100, b""]
    with tfrecord.TFRecordWriter(path) as writer:
        for p in payloads:
            writer.write(p)
    got = [bytes(r.numpy()) for r in tf.data.TFRecordDataset(path)]
    assert got == payloads


def test_tfrecord_file_written_by_tf(tmp_path):
    path = os.path.join(tmp_path, "shard-tf")
    payloads = [b"abc", b"x" * 1000]
    with tf.io.TFRecordWriter(path) as writer:
        for p in payloads:
            writer.write(p)
    assert list(tfrecord.read_records(path, verify_crc=True)) == payloads
    assert tfrecord.count_records([path]) == 2
