"""Piecewise timing of the flagship fwd(+bwd) step's components at bench
shapes: u-gen/pack, span kernels (fwd multi + perbounce), compaction,
state pack/unpack, bwd chain. Identifies where the non-compute ~20 ms
lives (round-5)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from benchmarks.flagship import BINS, build
from source_tpu.tracer import pallas_fused as pf
from source_tpu.tracer import wavefront as wf

scene, cfg, o, d = build()
key = jax.random.PRNGKey(0)
state = wf.init_rays(o, d, BINS)
spec = pf.fused_spec(scene, cfg)
gspec = pf.general_spec(spec)
N = o.shape[0]

def timeit(fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*a)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5)
    return round(min(ts) * 1e3, 3)

res = {}
# span shapes from the bench compact_schedule ((3,4),(3,4), rest)
spans = [(3, N), (3, N // 4), (10, N // 16)]
print("spans:", spans, flush=True)

# a) u gen + pack per span
for i, (ns, n) in enumerate(spans):
    f = jax.jit(lambda k, ns=ns, n=n: pf._pack_u(
        jax.random.uniform(k, (ns, n, 10), jnp.float32)))
    res[f"ugen_span{i}_ms"] = timeit(f, key)

# b) fwd span kernels alone (pre-packed u)
tab = jax.lax.stop_gradient(pf.pack_tabvec(scene, spec))
for i, (ns, n) in enumerate(spans):
    st = wf.init_rays(o[:n], d[:n], BINS)
    packed, _ = pf._pack_state(st)
    u_p = pf._pack_u(jax.random.uniform(key, (ns, n, 10), jnp.float32))
    uf = pf._flat_u(u_p)
    f = jax.jit(lambda tab, p, u, ns=ns: pf._span_fwd_call(spec, ns, 32, tab, p, u))
    res[f"spanfwd_multi_span{i}_ms"] = timeit(f, tab, packed, uf)
    def perb(tab, p, u_p, ns=ns):
        def body(c, u_t):
            new, bits = pf._bounce_fwd_call(spec, tab, c, u_t)
            return new, bits
        return jax.lax.scan(body, p, u_p)
    res[f"spanfwd_perb_span{i}_ms"] = timeit(jax.jit(perb), tab, packed, u_p)

# c) compaction alone (sort + gather at full width)
lane_ids = jnp.arange(N)
radf = jnp.zeros_like(state.radiance)
f = jax.jit(lambda st: wf._compact_lanes(st, 4, lane_ids, radf, key))
res["compact_full_ms"] = timeit(f, state)

# d) pack/unpack state at full width
f = jax.jit(lambda st: pf._pack_state(st)[0])
res["pack_state_ms"] = timeit(f, state)
packed_full, _ = pf._pack_state(state)
f = jax.jit(lambda p: pf._unpack_state(p, N, state, jnp.int32(0)).radiance)
res["unpack_state_ms"] = timeit(f, packed_full)

# e) full forward trace (multi default) for reference
f = jax.jit(lambda s, k: wf.trace_rays(s, cfg, state, k).radiance)
res["trace_fwd_full_ms"] = timeit(f, scene, key)

# f) diff trace fwd+bwd pieces: per-bounce bwd kernel chain at span shapes
for i, (ns, n) in enumerate(spans):
    st = wf.init_rays(o[:n], d[:n], BINS)
    packed, _ = pf._pack_state(st)
    u_p = pf._pack_u(jax.random.uniform(key, (ns, n, 10), jnp.float32))
    tabg = pf.pack_tabvec(scene, gspec)
    def fwd_res(tab, p, u_p, ns=ns):
        (carry, seg), resid = pf._span_fwd_impl((gspec, ns), tab, p, u_p)
        return carry, resid
    carry, resid = jax.jit(fwd_res)(tabg, packed, u_p)
    g_st = jax.tree.map(jnp.ones_like, carry)
    def bwd(tab, resid, g_st, ns=ns):
        return pf._span_bwd((gspec, ns), (tab,) + tuple(resid[1:]) if False else resid, (g_st, jnp.zeros((), jnp.int32)))
    # _span_bwd signature: (meta, res, g); res = (tabvec, u_all, per-bounce stacks)
    def bwd2(resid, g_st, ns=ns):
        return pf._span_bwd((gspec, ns), resid, (g_st, jnp.zeros((), jnp.int32)))
    res[f"bwd_perb_span{i}_ms"] = timeit(jax.jit(bwd2), resid, g_st)

print(json.dumps(res, indent=1), flush=True)
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "glue_probe.json"), "w") as f:
    json.dump(res, f, indent=1)
