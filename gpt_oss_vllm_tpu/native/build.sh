#!/bin/sh
# Build the native components into .so files next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libnf4core.so nf4core.cpp -lpthread
g++ -O3 -shared -fPIC -std=c++17 -o libblockalloc.so block_allocator.cpp
echo "built libnf4core.so libblockalloc.so"
