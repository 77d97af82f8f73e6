"""TPU validation of SOURCE_TPU_RNG=kernel: furnace exactness, statistical
agreement with the host-RNG stream, finite grads, and bench-step timing."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

from source_tpu.core.scenegraph.node import World
from source_tpu.primitive import Sphere
from source_tpu.optical.material import UnitySurfaceEmitter
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.parallel.engine import render_batch, render_loss_and_grads
from source_tpu.tracer.wavefront import RayConfig

# 1. furnace through the kernel-RNG fused span
os.environ["SOURCE_TPU_RNG"] = "kernel"
w = World()
Sphere(10.0, parent=w, material=UnitySurfaceEmitter())
s = compile_scene(w, SpectralConfig(400, 700, 4))
cfg = RayConfig(max_depth=4, max_iters=4, extinction_prob=0.0,
                compact_schedule=(), early_exit=False)
n = 4096
key = jax.random.PRNGKey(0)
dirs = jax.random.normal(key, (n, 3))
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
final = render_batch(s, cfg, jnp.zeros((n, 3)), dirs, key)
rad = np.asarray(final.radiance)
print("furnace krng:", rad.min(), rad.max(), "exact:", np.allclose(rad, 1.0, atol=1e-5), flush=True)
assert np.allclose(rad, 1.0, atol=1e-5)

# 2+3. flagship statistical agreement + finite grads
from benchmarks.flagship import BINS, build
scene, fcfg, o, d = build()
target = jnp.zeros((o.shape[0], BINS), jnp.float32)

def run(mode):
    os.environ["SOURCE_TPU_RNG"] = mode
    fwd = jax.jit(lambda s, k: render_batch(s, fcfg, o, d, k))
    st = fwd(scene, key)
    seg = int(st.segments)
    mean = float(jnp.mean(st.radiance))
    step = jax.jit(lambda s, k: render_loss_and_grads(s, fcfg, o, d, k, target))
    loss, g = step(scene, key)
    finite = all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g)
                 if hasattr(l, "dtype") and l.dtype.kind == "f")
    # timed: 5 steps in one jit
    def multi(s, k):
        def body(c, kk):
            loss, g = render_loss_and_grads(s, fcfg, o, d, kk, target)
            gs = sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g)
                     if hasattr(l, "dtype") and l.dtype.kind == "f")
            return c + loss + gs * 1e-20, None
        keys = jax.random.split(k, 10)
        return jax.lax.scan(body, jnp.float32(0), keys)[0]
    mstep = jax.jit(multi)
    jax.block_until_ready(mstep(scene, key))
    ts = []
    for g_ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(mstep(scene, jax.random.fold_in(key, g_)))
        ts.append((time.perf_counter() - t0) / 10)
    return {"mode": mode, "segments": seg, "mean_rad": mean,
            "loss": float(loss), "grads_finite": finite,
            "step_ms": round(min(ts) * 1e3, 2),
            "rays_per_s": round(seg / min(ts), 1)}

os.environ["SOURCE_TPU_SPAN_DIFF"] = "multi"  # krng requires multi; compare same kernel
r_host = run("host")
print(json.dumps(r_host), flush=True)
r_kern = run("kernel")
print(json.dumps(r_kern), flush=True)
dev = abs(r_kern["mean_rad"] - r_host["mean_rad"]) / max(abs(r_host["mean_rad"]), 1e-9)
segdev = abs(r_kern["segments"] - r_host["segments"]) / r_host["segments"]
print(f"mean_rad rel dev {dev:.4f}, segments rel dev {segdev:.4f}", flush=True)
assert r_kern["grads_finite"]
assert dev < 0.05 and segdev < 0.02
print("KRNG CHECK PASSED", flush=True)
