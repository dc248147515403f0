#!/bin/sh
# Build the native mesh runtime (libtds_mesh.so) next to this script.
set -e
cd "$(dirname "$0")"
g++ -std=c++17 -O2 -shared -fPIC -o libtds_mesh.so src/mesh_native.cpp
echo "built $(pwd)/libtds_mesh.so"
