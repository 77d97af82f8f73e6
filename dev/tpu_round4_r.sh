#!/bin/bash
cd /root/repo
timeout 2400 python -u bench.py
