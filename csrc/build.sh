#!/bin/sh
# Build the native helpers (C++ SAH BVH builder).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 bvh_builder.cpp -o libbvh_builder.so
echo "built libbvh_builder.so"
