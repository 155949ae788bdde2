#!/usr/bin/env bash
# Build the native host-path library. Any C compiler works; no Python headers
# needed (pure C ABI, loaded via ctypes).
set -e
cd "$(dirname "$0")"
CC="${CC:-cc}"
$CC -O2 -shared -fPIC -o libhashtok.so hashtok.c
echo "built $(pwd)/libhashtok.so"
