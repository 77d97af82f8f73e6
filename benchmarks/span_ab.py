"""Round-5 A/B: span mode + tile sizes on the flagship fwd+bwd step.

One TPU process; each config gets its own jit trace (tiles are static
meta now). Prints one JSON line per config; failures (VMEM OOM) are
caught and reported.
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp

from benchmarks.flagship import BINS, build
from source_tpu.parallel.engine import render_batch, render_loss_and_grads

scene, cfg, o, d = build()
target = jnp.zeros((o.shape[0], BINS), jnp.float32)
key = jax.random.PRNGKey(0)

# forward segments for the rays/s denominator (one trusted config)
os.environ["SOURCE_TPU_SPAN"] = "perbounce"
fwd = jax.jit(lambda s, k: render_batch(s, cfg, o, d, k))
segments = int(fwd(scene, key).segments)
print(json.dumps({"segments": segments}), flush=True)

CONFIGS = [
    ("perbounce", 32, 8),
    ("multi", 32, 8),
    ("multi", 32, 16),
    ("multi", 16, 16),
    ("multi", 32, 32),
    ("multi", 8, 8),
]

def measure(step):
    outs = [step(scene, jax.random.PRNGKey(50 + i)) for i in range(2)]
    jax.block_until_ready(outs)  # warm + compile
    times = []
    for g in range(3):
        t0 = time.perf_counter()
        outs = [step(scene, jax.random.PRNGKey(g * 100 + i + 1))
                for i in range(5)]
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / 5)
    return min(times)

for mode, tf, tb in CONFIGS:
    os.environ["SOURCE_TPU_SPAN"] = mode
    os.environ["SOURCE_TPU_SPAN_TILE"] = str(tf)
    os.environ["SOURCE_TPU_SPAN_BWD_TILE"] = str(tb)
    tag = f"{mode}-f{tf}-b{tb}"
    try:
        t0 = time.time()
        step = jax.jit(
            lambda s, k: render_loss_and_grads(s, cfg, o, d, k, target))
        dt = measure(step)
        print(json.dumps({
            "config": tag, "step_ms": round(dt * 1e3, 2),
            "rays_per_s": round(segments / dt, 1),
            "compile_s": round(time.time() - t0 - 15 * dt, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"config": tag, "error": str(e)[:300]}), flush=True)

# forward-only isolation: multi fwd span vs perbounce fwd chain
for mode, tf in [("perbounce", 32), ("multi", 32), ("multi", 16)]:
    os.environ["SOURCE_TPU_SPAN"] = mode
    os.environ["SOURCE_TPU_SPAN_TILE"] = str(tf)
    try:
        f = jax.jit(lambda s, k: render_batch(s, cfg, o, d, k).radiance)
        jax.block_until_ready([f(scene, jax.random.PRNGKey(9))])
        times = []
        for g in range(3):
            t0 = time.perf_counter()
            outs = [f(scene, jax.random.PRNGKey(g * 50 + i)) for i in range(5)]
            jax.block_until_ready(outs)
            times.append((time.perf_counter() - t0) / 5)
        dt = min(times)
        print(json.dumps({"config": f"fwdonly-{mode}-f{tf}",
                          "step_ms": round(dt * 1e3, 2),
                          "rays_per_s": round(segments / dt, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"config": f"fwdonly-{mode}-f{tf}",
                          "error": str(e)[:300]}), flush=True)
