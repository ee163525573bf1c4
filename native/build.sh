#!/bin/bash
# Build the native host kernels -> deva_tpu/utils/libdevac.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o ../deva_tpu/utils/libdevac.so devac.cpp
echo "built deva_tpu/utils/libdevac.so"
