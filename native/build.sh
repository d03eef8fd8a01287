#!/bin/sh
# Build the native loader: native/build.sh [out_dir]
set -e
cd "$(dirname "$0")"
OUT="${1:-.}"
g++ -O3 -fPIC -shared -std=c++17 -o "$OUT/libomnigs_loader.so" loader.cpp -ljpeg -lpng -lpthread
echo "built $OUT/libomnigs_loader.so"
