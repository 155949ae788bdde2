#!/usr/bin/env bash
# Build the native host-path components. No Python headers needed: the
# tokenizer is a pure-C-ABI library loaded via ctypes, miniredis is a
# standalone binary.
set -e
cd "$(dirname "$0")"
CC="${CC:-cc}"
CXX="${CXX:-c++}"
$CC -O2 -shared -fPIC -o libhashtok.so hashtok.c
echo "built $(pwd)/libhashtok.so"
$CXX -O2 -std=c++17 -shared -fPIC -pthread -o libhttpfront.so httpfront.cc
echo "built $(pwd)/libhttpfront.so"
$CXX -O2 -std=c++17 -o miniredis miniredis.cc
echo "built $(pwd)/miniredis"
if [ -f ../../benchmarks/loadgen_native.cc ]; then
  $CXX -O2 -std=c++17 -o ../../benchmarks/loadgen_native ../../benchmarks/loadgen_native.cc
  echo "built $(cd ../../benchmarks && pwd)/loadgen_native"
fi
