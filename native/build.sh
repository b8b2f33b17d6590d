#!/bin/sh
# Build the native batch loader: g++ -O3, no external dependencies.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libgifloader.so batch_loader.cpp -lpthread
echo "built $(pwd)/libgifloader.so"
