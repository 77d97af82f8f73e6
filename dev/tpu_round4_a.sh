#!/bin/bash
# Round-4 TPU measurement batch A: fused megakernel bench + A/B
set -x
cd /root/repo
timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((1000,1000)); print('health:', float((x@x).sum()), jax.devices())
" || exit 1
echo '=== bench.py (fused ON, default) ==='
timeout 2400 python -u bench.py
echo '=== bench.py (fused OFF A/B) ==='
SOURCE_TPU_FUSED=0 timeout 1800 python -u bench.py
