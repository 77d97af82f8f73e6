#!/bin/bash
set -x
cd /root/repo
echo '=== bench TILE 64 ==='
SOURCE_TPU_FUSED_TILE=64 timeout 2400 python -u bench.py
echo '=== bench TILE 16 ==='
SOURCE_TPU_FUSED_TILE=16 timeout 1800 python -u bench.py
