#!/bin/bash
# Build the reference C++ binaries (pqtree, deltapq) out-of-tree for
# cross-validation.  The reference's CMake requires Boost (unused in
# code), so we compile directly; one symbol rename in the build COPY of
# main.cpp fixes an ODR collision that old linkers tolerated.
set -e
SRC=${1:-/root/reference}
OUT=${2:-/tmp/refbuild}
mkdir -p "$OUT"
cp "$SRC"/*.cpp "$SRC"/*.h "$OUT"/
cd "$OUT"
sed -i 's/comp_max_heap/comp_max_heap_main/g' main.cpp
CXXFLAGS="-std=c++11 -O3 -fopenmp -fcommon -w $(pkg-config --cflags opencv4)"
LIBS="$(pkg-config --libs opencv4)"
g++ $CXXFLAGS main.cpp pq.cpp utils.cpp pq_tree.cpp pqbase.cpp -o pqtree $LIBS
g++ $CXXFLAGS deltapq_approx_tree_main.cpp pq.cpp utils.cpp pq_tree.cpp -o deltapq $LIBS
echo "built: $OUT/pqtree $OUT/deltapq"
