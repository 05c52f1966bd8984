#!/bin/sh
# Build the native evaluation core -> ccore/libptteval.so
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 eval_core.cpp -o libptteval.so
echo "built $(pwd)/libptteval.so"
