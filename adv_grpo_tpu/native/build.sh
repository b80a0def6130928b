#!/bin/sh
# Build the native host-helper shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libadvgrpo_native.so levenshtein.cpp image_loader.cpp -lpng -ljpeg -lpthread
echo "built $(pwd)/libadvgrpo_native.so"
