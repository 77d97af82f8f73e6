"""Round-5 TPU smoke: Mosaic-compile + run the new multi-bounce span kernels
(fwd + bwd) on the flagship scene at small batch, then the paged-mesh kernel
with the ray->page sort. One process, minimal host syncs (axon relay memory).
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

t00 = time.time()
print("backend:", jax.default_backend(), flush=True)

from benchmarks.flagship import BINS, build
from source_tpu.parallel.engine import render_batch, render_loss_and_grads

scene, cfg, o, d = build()
# small batch: 16k rays for the smoke
o_s, d_s = o[:16384], d[:16384]
target = jnp.zeros((o_s.shape[0], BINS), jnp.float32)
key = jax.random.PRNGKey(0)

t0 = time.time()
fwd = jax.jit(lambda s, k: render_batch(s, cfg, o_s, d_s, k))
final = fwd(scene, key)
seg = int(final.segments)
print(f"fwd span compile+run: {time.time()-t0:.1f}s, segments={seg}", flush=True)
rad = np.asarray(final.radiance)
assert np.isfinite(rad).all(), "non-finite radiance"
print("rad mean:", float(rad.mean()), flush=True)

t0 = time.time()
step = jax.jit(lambda s, k: render_loss_and_grads(s, cfg, o_s, d_s, k, target))
loss, grads = step(scene, key)
jax.block_until_ready(loss)
print(f"fwd+bwd span compile+run: {time.time()-t0:.1f}s loss={float(loss):.6f}", flush=True)
for f in ["leaf_w2l", "leaf_params", "mat_params", "mat_spectra", "mat_scalars"]:
    a = np.asarray(getattr(grads, f))
    ok = np.isfinite(a).all()
    print(f"grad {f}: finite={ok} sum|g|={np.abs(a).sum():.4g}", flush=True)

# timed small steps (pipelined group of 3)
t0 = time.time()
outs = [step(scene, jax.random.PRNGKey(i + 1)) for i in range(3)]
jax.block_until_ready(outs)
dt = (time.time() - t0) / 3
print(f"16k-step: {dt*1e3:.1f} ms -> {seg/dt:.3g} seg/s", flush=True)
print(f"total smoke wall: {time.time()-t00:.1f}s", flush=True)
