#!/bin/bash
set -x
cd /root/repo
timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((1000,1000)); print('health:', float((x@x).sum()), jax.devices())
" || exit 1
timeout 2400 python -u benchmarks/launchprobe.py
