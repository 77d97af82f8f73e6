"""Attribute the fused forward's time: strided-plane DMA vs contiguous-block
DMA vs in-kernel loop overhead vs pure bounce compute (round-5)."""
import functools, json, sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128
T = 32
R = 2048
C = 38
STEPS = 8

def timeit(fn, *a):
    jax.block_until_ready(fn(*a))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
    return min(ts) * 1e3

res = {}

# 1. strided-plane copy (current layout): (C, R, L), block (C, T, L)
def k_copy(x_ref, y_ref):
    y_ref[...] = x_ref[...] + 1.0

x = jnp.zeros((C, R, L), jnp.float32)
f1 = jax.jit(lambda x: pl.pallas_call(
    k_copy, grid=(R // T,),
    in_specs=[pl.BlockSpec((C, T, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((C, T, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((C, R, L), jnp.float32))(x))
res["strided_copy_1x_ms"] = round(timeit(f1, x), 3)

# chained 8x (like 8 bounces of state round-trips)
f1c = jax.jit(lambda x: functools.reduce(lambda a, _: f1(a), range(STEPS), x))
def chain(x):
    for _ in range(STEPS):
        x = pl.pallas_call(
            k_copy, grid=(R // T,),
            in_specs=[pl.BlockSpec((C, T, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((C, T, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, R, L), jnp.float32))(x)
    return x
res["strided_copy_8x_ms"] = round(timeit(jax.jit(chain), x), 3)

# 2. contiguous pre-tiled copy: (R//T, C, T, L), block (1, C, T, L)
x2 = jnp.zeros((R // T, C, T, L), jnp.float32)
def chain2(x):
    for _ in range(STEPS):
        x = pl.pallas_call(
            k_copy, grid=(R // T,),
            in_specs=[pl.BlockSpec((1, C, T, L), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, C, T, L), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R // T, C, T, L), jnp.float32))(x)
    return x
res["contig_copy_8x_ms"] = round(timeit(jax.jit(chain2), x2), 3)

# 3. in-kernel 8-step loop, state resident, no per-step HBM (loop overhead)
def k_loop(x_ref, y_ref):
    def body(i, c):
        return tuple(v * 1.0001 + 0.001 for v in c)
    c = jax.lax.fori_loop(0, STEPS, body, tuple(x_ref[c] for c in range(C)))
    for i in range(C):
        y_ref[i] = c[i]

f3 = jax.jit(lambda x: pl.pallas_call(
    k_loop, grid=(R // T,),
    in_specs=[pl.BlockSpec((C, T, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((C, T, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((C, R, L), jnp.float32))(x))
res["resident_loop_8x_ms"] = round(timeit(f3, x), 3)

# 4. pure bounce-core compute x8, state resident, constant u (no u DMA)
from benchmarks.flagship import build
from source_tpu.tracer import pallas_fused as pf
from source_tpu.tracer.wavefront import RayConfig, init_rays
scene, cfg0, o_all, d_all = build()
cfg = RayConfig(max_depth=16, extinction_prob=0.1, extinction_min_depth=3,
                importance_sampling=True, important_path_weight=0.25,
                max_iters=STEPS, compact_schedule=(), early_exit=False)
spec = pf.fused_spec(scene, cfg)
B = spec.bins
state = init_rays(o_all[:R * L], d_all[:R * L], B)
packed, _ = pf._pack_state(state)
tabvec = pf.pack_tabvec(scene, spec)

def k_compute(tab_ref, o_ref, d_ref, thr_ref, rad_ref, aux_ref, o_out, d_out,
              thr_out, rad_out, aux_out):
    tget = lambda k: tab_ref[k]
    u = tuple(jnp.full_like(o_ref[0], 0.3 + 0.04 * k) for k in range(10))
    def body(i, c):
        o, d, thr, rad, alivef, depth = c
        out = pf._bounce_core(spec, tget,
                              {"o": o, "d": d, "thr": thr,
                               "alive": alivef > 0.5, "depth": depth}, u, None)
        return (out["o"], out["d"], out["thr"],
                tuple(rad[b] + out["rad_delta"][b] for b in range(B)),
                jnp.where(out["alive_next"], 1.0, 0.0), out["depth"])
    c = jax.lax.fori_loop(0, STEPS, body,
                          (tuple(o_ref[c] for c in range(3)),
                           tuple(d_ref[c] for c in range(3)),
                           tuple(thr_ref[b] for b in range(B)),
                           tuple(rad_ref[b] for b in range(B)),
                           aux_ref[0], aux_ref[1]))
    o, d, thr, rad, alivef, depth = c
    for k in range(3):
        o_out[k] = o[k]; d_out[k] = d[k]
    for b in range(B):
        thr_out[b] = thr[b]; rad_out[b] = rad[b]
    aux_out[0] = alivef; aux_out[1] = depth

def vs(c):
    return pl.BlockSpec((c, T, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

f4 = jax.jit(lambda tab, st: pl.pallas_call(
    k_compute, grid=(R // T,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vs(3), vs(3), vs(B), vs(B), vs(2)],
    out_specs=(vs(3), vs(3), vs(B), vs(B), vs(2)),
    out_shape=(jax.ShapeDtypeStruct((3, R, L), jnp.float32),
               jax.ShapeDtypeStruct((3, R, L), jnp.float32),
               jax.ShapeDtypeStruct((B, R, L), jnp.float32),
               jax.ShapeDtypeStruct((B, R, L), jnp.float32),
               jax.ShapeDtypeStruct((2, R, L), jnp.float32)))(tab, st["o"], st["d"], st["thr"], st["rad"], st["aux"]))
res["compute_only_8x_ms"] = round(timeit(f4, tabvec, packed), 3)

# 5. u generation + packing alone (XLA)
key = jax.random.PRNGKey(0)
f5 = jax.jit(lambda k: pf._pack_u(
    jax.random.uniform(k, (STEPS, R * L, 10), jnp.float32)))
res["u_gen_pack_ms"] = round(timeit(f5, key), 3)

print(json.dumps(res, indent=1))
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "dma_probe.json"), "w") as f:
    json.dump(res, f, indent=1)
