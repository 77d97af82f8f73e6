"""Device-side piece costs via IN-JIT repetition (the axon relay adds a
~5 ms fixed dispatch cost per jitted call, so each piece repeats REPS
times inside one jit with data dependence; cost = (t_reps - t_1)/(REPS-1))."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from benchmarks.flagship import BINS, build
from source_tpu.tracer import pallas_fused as pf
from source_tpu.tracer import wavefront as wf

scene, cfg, o, d = build()
key0 = jax.random.PRNGKey(0)
state = wf.init_rays(o, d, BINS)
spec = pf.fused_spec(scene, cfg)
gspec = pf.general_spec(spec)
N = o.shape[0]
REPS = 8

def timeit(fn, *a):
    out = fn(*a); jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(*a)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 4)
    return min(ts) * 1e3

def per_piece(make_fn):
    """make_fn(reps) -> jitted callable; returns device ms per rep."""
    t1 = timeit(make_fn(1))
    tR = timeit(make_fn(REPS))
    return round((tR - t1) / (REPS - 1), 3)

res = {}
res["dispatch_floor_ms"] = round(timeit(jax.jit(lambda: jnp.float32(1) + 1)), 3)

spans = [(3, N), (3, N // 4), (10, N // 16)]

# a) u gen + pack
for i, (ns, n) in enumerate(spans):
    def mk(reps, ns=ns, n=n):
        @jax.jit
        def f():
            def body(k, acc):
                u = pf._pack_u(jax.random.uniform(
                    jax.random.fold_in(key0, k), (ns, n, 10), jnp.float32))
                return acc + u[0, 0, 0, 0]
            acc = jnp.float32(0)
            for k in range(reps):
                acc = body(k, acc)
            return acc
        return f
    res[f"ugen_span{i}_ms"] = per_piece(mk)

# b) span fwd kernels
tab = jax.lax.stop_gradient(pf.pack_tabvec(scene, spec))
for i, (ns, n) in enumerate(spans):
    st = wf.init_rays(o[:n], d[:n], BINS)
    packed, _ = pf._pack_state(st)
    u_p = pf._pack_u(jax.random.uniform(key0, (ns, n, 10), jnp.float32))
    uf = pf._flat_u(u_p)
    def mk_multi(reps, ns=ns, packed=packed, uf=uf):
        @jax.jit
        def f():
            p = packed
            for _ in range(reps):
                p, bits = pf._span_fwd_call(spec, ns, 32, tab, p, uf)
            return p["rad"][0, 0, 0]
        return f
    res[f"spanfwd_multi_span{i}_ms"] = per_piece(mk_multi)
    def mk_perb(reps, ns=ns, packed=packed, u_p=u_p):
        @jax.jit
        def f():
            p = packed
            for _ in range(reps):
                def body(c, u_t):
                    new, bits = pf._bounce_fwd_call(spec, tab, c, u_t)
                    return new, None
                p, _ = jax.lax.scan(body, p, u_p)
            return p["rad"][0, 0, 0]
        return f
    res[f"spanfwd_perb_span{i}_ms"] = per_piece(mk_perb)

# c) compaction at full width
lane_ids = jnp.arange(N)
radf = jnp.zeros_like(state.radiance)
def mk_comp(reps):
    @jax.jit
    def f():
        import dataclasses as dc
        st = state
        acc = jnp.float32(0)
        for k in range(reps):
            st2 = dc.replace(state, radiance=state.radiance + acc)
            sub, li, rf = wf._compact_lanes(st2, 4, lane_ids, radf,
                                            jax.random.fold_in(key0, k))
            acc = acc + rf[0, 0] * 0 + sub.radiance[0, 0] * 1e-9
        return acc
    return f
res["compact_full_ms"] = per_piece(mk_comp)

# d) per-bounce bwd chain per span
for i, (ns, n) in enumerate(spans):
    st = wf.init_rays(o[:n], d[:n], BINS)
    packed, _ = pf._pack_state(st)
    u_p = pf._pack_u(jax.random.uniform(key0, (ns, n, 10), jnp.float32))
    tabg = pf.pack_tabvec(scene, gspec)
    (carry, seg), resid = jax.jit(
        lambda: pf._span_fwd_impl((gspec, ns), tabg, packed, u_p))()
    g_st = jax.tree.map(jnp.ones_like, carry)
    def mk_bwd(reps, ns=ns, resid=resid, g_st=g_st):
        @jax.jit
        def f():
            import dataclasses as dc
            acc = jnp.float32(0)
            for k in range(reps):
                g2 = dict(g_st)
                g2["rad"] = g_st["rad"] + acc
                ct, cs, cu = pf._span_bwd((gspec, ns), resid,
                                          (g2, jnp.zeros((), jnp.int32)))
                acc = acc + ct[0] * 1e-9
            return acc
        return f
    res[f"bwd_perb_span{i}_ms"] = per_piece(mk_bwd)

print(json.dumps(res, indent=1), flush=True)
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "glue_probe2.json"), "w") as f:
    json.dump(res, f, indent=1)
