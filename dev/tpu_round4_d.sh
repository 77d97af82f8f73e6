#!/bin/bash
set -x
cd /root/repo
timeout 300 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((1000,1000)); print('health:', float((x@x).sum()), jax.devices())
" || exit 1
echo '=== fusedprof ==='
timeout 3000 python -u benchmarks/fusedprof.py
echo '=== suite ==='
timeout 4800 python -u benchmarks/suite.py
echo '=== bigmesh ==='
timeout 2400 python -u benchmarks/bigmesh.py
echo '=== mfu ==='
timeout 2400 python -u benchmarks/mfu.py
