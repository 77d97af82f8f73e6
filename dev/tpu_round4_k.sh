#!/bin/bash
set -x
cd /root/repo
timeout 2400 python -u benchmarks/launchprobe.py --isolate
