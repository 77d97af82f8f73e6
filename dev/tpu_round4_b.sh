#!/bin/bash
# Round-4 TPU batch B: fixed fused megakernel bench + A/B + lens scaling
set -x
cd /root/repo
timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((1000,1000)); print('health:', float((x@x).sum()), jax.devices())
" || exit 1
echo '=== bench.py (fused ON, default) ==='
timeout 2400 python -u bench.py
echo '=== bench.py (fused OFF A/B) ==='
SOURCE_TPU_FUSED=0 timeout 1800 python -u bench.py
echo '=== lensscale ==='
timeout 3000 python -u benchmarks/lensscale.py
