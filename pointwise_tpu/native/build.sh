#!/bin/sh
# Build the native grid-hash library. Invoked automatically by
# pointwise_tpu.native on first import when the .so is missing/stale.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libgridhash.so gridhash.cpp
echo "built $(pwd)/libgridhash.so"
