#!/bin/bash
# Build the native host-side batcher (native/batcher.cc) into
# weaksuppointcloudseg_tpu/_native/libbatcher.so. Pure-numpy fallback is
# used automatically when the library is absent.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p weaksuppointcloudseg_tpu/_native
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    native/batcher.cc \
    -o weaksuppointcloudseg_tpu/_native/libbatcher.so
echo "built weaksuppointcloudseg_tpu/_native/libbatcher.so"
