#!/bin/sh
# Build the native runtime components into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -std=c++17 -shared -fPIC \
    -o lib/libssm_native.so voxel_map.cpp
echo "built native/lib/libssm_native.so"
