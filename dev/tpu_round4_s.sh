#!/bin/bash
set -x
cd /root/repo
for T in 16 32 128; do
  echo "=== bigmesh PAGE_TILE=$T ==="
  SOURCE_TPU_PAGE_TILE=$T timeout 1500 python -u benchmarks/bigmesh.py 2>&1 | grep -E "paged pallas|pages:"
done
