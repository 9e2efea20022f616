"""Loader for the optional native host library (csrc/libsrf_io.so).

The library holds the host-side hot paths that stay off the TPU: the
CRC-32C TFRecord scan (csrc/srf_io.cc) and the C++ CTC prefix beam search
(csrc/ctc_beam.cc). It is a build artifact (never committed), so a fresh
checkout would silently fall back to the pure-Python paths — this loader
builds it on first use when a C++ toolchain is available (csrc/build.sh,
~2 s) and logs the fallback otherwise instead of degrading silently.

Library/production use may not want a compiler subprocess on first
TFRecord read (surprising first-use latency in sandboxed environments —
ADVICE r2): set SRF_AUTOBUILD=0 to restrict the loader to load-if-present
(the trainer/tool CLIs and the test/bench entry points keep the default
auto-build).
"""

import ctypes
import logging
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None  # None = not tried yet; False = unavailable


def _csrc_dir():
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc",
    )


def load_native_lib():
    """Returns the loaded ctypes library, or False if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        csrc = _csrc_dir()
        lib_path = os.path.join(csrc, "libsrf_io.so")
        script = os.path.join(csrc, "build.sh")
        autobuild = os.environ.get("SRF_AUTOBUILD", "1") != "0"
        if autobuild and not os.path.exists(lib_path) and os.path.exists(script):
            try:
                subprocess.run(
                    ["bash", script], capture_output=True, timeout=180,
                    check=True,
                )
            except (OSError, subprocess.SubprocessError) as exc:
                logging.getLogger(__name__).warning(
                    "csrc/build.sh failed (%s); native host paths disabled "
                    "(pure-Python fallbacks in use)", exc,
                )
        lib = False
        if os.path.exists(lib_path):
            try:
                lib = ctypes.CDLL(lib_path)
            except OSError as exc:
                logging.getLogger(__name__).warning(
                    "could not load %s (%s); pure-Python fallbacks in use",
                    lib_path, exc,
                )
        _lib = lib
        return _lib
