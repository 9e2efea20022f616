#!/bin/bash
# Build the native host-I/O library for srf_tpu.
set -e
cd "$(dirname "$0")"
CXX=${CXX:-g++}
FLAGS="-O3 -shared -fPIC -std=c++17 -Wall"
# Use the hardware CRC path when the build machine supports SSE4.2.
if grep -q sse4_2 /proc/cpuinfo 2>/dev/null; then
  FLAGS="$FLAGS -msse4.2"
fi
# Write to a per-process temp then rename: rename(2) is atomic, so
# concurrent first-use auto-builds (srf_tpu/utils/native.py) can race
# freely — a reader either sees no file or a complete one, never a
# half-written .so.
TMP="libsrf_io.so.tmp.$$"
trap 'rm -f "$TMP"' EXIT
$CXX $FLAGS srf_io.cc ctc_beam.cc -o "$TMP"
mv -f "$TMP" libsrf_io.so
echo "built csrc/libsrf_io.so"
