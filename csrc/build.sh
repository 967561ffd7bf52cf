#!/bin/sh
# Build the native helpers (C++ SAH BVH builder + HDR RLE decoder).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 bvh_builder.cpp -o libbvh_builder.so
echo "built libbvh_builder.so"
g++ -O3 -march=native -fPIC -shared -std=c++17 hdr_rle.cpp -o libhdr_rle.so
echo "built libhdr_rle.so"
