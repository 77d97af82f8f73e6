"""Device-side FULL-step costs via in-jit repetition: trace fwd, diff
fwd+bwd, loss+grads; plus compaction-schedule A/B."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import jax, jax.numpy as jnp

from benchmarks.flagship import BINS, build
from source_tpu.parallel.engine import render_loss_and_grads, render_batch
from source_tpu.tracer import wavefront as wf

scene, cfg, o, d = build()
key0 = jax.random.PRNGKey(0)
target = jnp.zeros((o.shape[0], BINS), jnp.float32)
REPS = 4

def timeit(fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*a)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 3)
    return min(ts) * 1e3

def per_piece(make_fn):
    t1 = timeit(make_fn(1))
    tR = timeit(make_fn(REPS))
    return round((tR - t1) / (REPS - 1), 3), round(t1, 3)

res = {}

def mk_full(cfg):
    def mk(reps):
        @jax.jit
        def f():
            acc = None
            loss_acc = jnp.float32(0)
            for k in range(reps):
                loss, g = render_loss_and_grads(
                    scene, cfg, o, d, jax.random.fold_in(key0, k),
                    target + loss_acc)
                loss_acc = loss_acc + loss * 1e-9
            return loss_acc
        return f
    return mk

def mk_fwd(cfg):
    def mk(reps):
        @jax.jit
        def f():
            acc = jnp.float32(0)
            for k in range(reps):
                st = render_batch(scene, cfg, o, d, jax.random.fold_in(key0, k))
                acc = acc + st.radiance[0, 0] * 1e-9
            return acc
        return f
    return mk

dev, one = per_piece(mk_full(cfg))
res["full_step_dev_ms"] = dev
res["full_step_1call_ms"] = one
dev, one = per_piece(mk_fwd(cfg))
res["fwd_trace_dev_ms"] = dev
res["fwd_trace_1call_ms"] = one

# schedule A/B (device cost of the full step)
for tag, sched in [("s3_16", ((3, 16),)), ("s3_8", ((3, 8),)),
                   ("none", ()), ("s34_34", ((3, 4), (3, 4)))]:
    cfg2 = dataclasses.replace(cfg, compact_schedule=sched)
    dev, one = per_piece(mk_full(cfg2))
    res[f"full_dev_{tag}_ms"] = dev
print(json.dumps(res, indent=1), flush=True)
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "glue_probe3.json"), "w") as f:
    json.dump(res, f, indent=1)
