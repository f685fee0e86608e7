#!/usr/bin/env bash
# Build the native CPU oracle kernels -> native/libauxpm_cpu.so
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -fPIC -shared se_gram.cpp -o libauxpm_cpu.so
echo "built $(pwd)/libauxpm_cpu.so"
