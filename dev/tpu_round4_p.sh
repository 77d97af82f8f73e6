#!/bin/bash
set -x
cd /root/repo
echo '=== bench.py (pipelined protocol) ==='
timeout 2400 python -u bench.py
echo '=== suite (fused fast records) ==='
timeout 4800 python -u benchmarks/suite.py
echo '=== mfu refresh ==='
timeout 2400 python -u benchmarks/mfu.py
