#!/bin/sh
# Build the native host-runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    posebyte_native.cpp -o libposebyte_native.so
echo "built native/libposebyte_native.so"
