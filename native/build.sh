#!/bin/sh
# Build the native host-side image core (ctypes-loaded shared library).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC -o libfastimg.so fastimg.cpp
echo "built $(pwd)/libfastimg.so"
