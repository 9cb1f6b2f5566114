#!/bin/sh
# Build the native host-side geo kernels (ctypes shared library).
set -e
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$ROOT/native/build"
g++ -O3 -march=native -shared -fPIC \
    -o "$ROOT/native/build/libgeokernels.so" \
    "$ROOT/native/geokernels.cc"
echo "built $ROOT/native/build/libgeokernels.so"
