"""Native (C++) host kernels: TFRecord framing safety.

The scanner parses untrusted on-disk bytes; a corrupt record length near
2^64 used to wrap the ``pos + len + 4`` bounds check and report an
out-of-bounds record span (memory-safety bug found by review, fixed with
an overflow-safe comparison in csrc/srf_io.cc).
"""

import ctypes
import struct

import pytest

from srf_tpu.utils.native import load_native_lib


@pytest.fixture(scope="module")
def lib():
    handle = load_native_lib()
    if not handle:  # returns False when unavailable
        pytest.skip("native lib unavailable (SRF_AUTOBUILD=0 or no compiler)")
    handle.srf_tfrecord_scan.restype = ctypes.c_int64
    handle.srf_tfrecord_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    return handle


def _scan(lib, buf):
    offs = (ctypes.c_int64 * 8)()
    lens = (ctypes.c_int64 * 8)()
    n = lib.srf_tfrecord_scan(buf, len(buf), 8, offs, lens)
    return n, list(offs), list(lens)


def test_scan_valid_framing(lib):
    payload = b"hello"
    buf = (struct.pack("<Q", len(payload)) + b"\x00" * 4
           + payload + b"\x00" * 4)
    n, offs, lens = _scan(lib, buf)
    assert n == 1
    assert buf[offs[0] : offs[0] + lens[0]] == payload


def test_scan_rejects_overflowing_length(lib):
    # len = 2^64 - 8 wraps a naive pos + len + 4 <= size check
    buf = struct.pack("<Q", 2**64 - 8) + b"\x00" * 4 + b"xxxx"
    n, _, _ = _scan(lib, buf)
    assert n == -1


def test_scan_rejects_truncated_record(lib):
    buf = struct.pack("<Q", 100) + b"\x00" * 4 + b"short"
    n, _, _ = _scan(lib, buf)
    assert n == -1
