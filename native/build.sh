#!/bin/sh
# Build the native augmentation library.
set -e
cd "$(dirname "$0")"
g++ -O3 -fopenmp -shared -fPIC -o libaug_ops.so aug_ops.cpp
echo "built native/libaug_ops.so"
