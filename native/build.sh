#!/bin/sh
# Build the native host-runtime library into the Python package.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -o ../toypathtracer_tpu/libtptnative.so tptnative.cpp
echo "built toypathtracer_tpu/libtptnative.so"
