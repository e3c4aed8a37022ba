#!/bin/sh
# Build the native components into this directory.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libmatching_parser.so matching_parser.cpp
echo "built libmatching_parser.so"
