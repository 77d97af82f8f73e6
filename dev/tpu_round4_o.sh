#!/bin/bash
cd /root/repo
timeout 3000 python -u benchmarks/launchprobe.py --pipeline
