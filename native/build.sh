#!/bin/sh
# Build the native components into this directory.
set -e
cd "$(dirname "$0")"
# image_decode.cpp needs libpng; build without it if the dev headers are
# missing (the Python layer falls back to imageio for image loads).
if g++ -O3 -shared -fPIC -o libmatching_parser.so \
       matching_parser.cpp image_decode.cpp -lpng 2>/dev/null; then
  echo "built libmatching_parser.so (with libpng decode)"
else
  g++ -O3 -shared -fPIC -o libmatching_parser.so matching_parser.cpp
  echo "built libmatching_parser.so (no libpng — image decode disabled)"
fi
