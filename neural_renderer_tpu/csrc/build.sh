#!/bin/sh
# Build the native helpers (C++ SAH BVH builder + HDR RLE decoder + OBJ
# parser). Each is also auto-compiled on demand by its Python binding.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 bvh_builder.cpp -o libbvh_builder.so
echo "built libbvh_builder.so"
g++ -O3 -march=native -fPIC -shared -std=c++17 hdr_rle.cpp -o libhdr_rle.so
echo "built libhdr_rle.so"
g++ -O3 -march=native -fPIC -shared -std=c++17 obj_parser.cpp -o libobj_parser.so
echo "built libobj_parser.so"
