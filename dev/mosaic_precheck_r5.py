"""Jaxpr scan for Mosaic-rejected bool vector selects in the new span
kernel bodies (memory: pallas-mosaic-gotchas — select_n with i1 outvars)."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["SOURCE_TPU_FUSED"] = "1"
import numpy as np, jax, jax.numpy as jnp

from demos.cornell_box import build_world
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.tracer import pallas_fused as PF
from source_tpu.tracer.wavefront import RayConfig

scene = compile_scene(build_world(glass=True), SpectralConfig(375., 740., 5))
cfg = RayConfig(max_depth=6, max_iters=6, compact_schedule=(), early_exit=False)
spec = PF.fused_spec(scene, cfg)
gspec = PF.general_spec(spec)
B = gspec.bins
T, L = 8, 128
n_steps = 4

def fwd_span_body(tab, o, d, thr, rad, aux, u, bits_buf):
    tget = lambda k: tab[k]
    def bounce(i, c):
        o_, d_, thr_, rad_, alivef, depth, bb = c
        uu = tuple(jax.lax.dynamic_slice(u, (i * 10, 0, 0), (10, T, L))[k] for k in range(10))
        out = PF._bounce_core(gspec, tget,
                              {"o": o_, "d": d_, "thr": thr_,
                               "alive": alivef > 0.5, "depth": depth}, uu, None)
        bb = jax.lax.dynamic_update_slice(bb, out["bits"][None], (i, 0, 0))
        return (out["o"], out["d"], out["thr"],
                tuple(rad_[b] + out["rad_delta"][b] for b in range(B)),
                jnp.where(out["alive_next"], 1.0, 0.0), out["depth"], bb)
    def body(i, c):
        return jax.lax.cond(jnp.max(c[4]) > 0.5, lambda cc: bounce(i, cc),
                            lambda cc: cc, c)
    c0 = (tuple(o[c] for c in range(3)), tuple(d[c] for c in range(3)),
          tuple(thr[b] for b in range(B)), tuple(rad[b] for b in range(B)),
          aux[0], aux[1], bits_buf)
    return jax.lax.fori_loop(0, n_steps, body, c0)

args = (jnp.zeros((PF.tab_size(gspec),)),
        jnp.zeros((3, T, L)), jnp.zeros((3, T, L)),
        jnp.zeros((B, T, L)), jnp.zeros((B, T, L)), jnp.zeros((2, T, L)),
        jnp.zeros((n_steps * 10, T, L)), jnp.zeros((n_steps, T, L), jnp.int32))
jaxpr = jax.make_jaxpr(fwd_span_body)(*args)

def scan(jx, path="top"):
    bad = []
    for eqn in jx.eqns:
        if eqn.primitive.name == "select_n":
            for ov in eqn.outvars:
                if getattr(ov.aval, "dtype", None) == jnp.bool_.dtype and getattr(ov.aval, "shape", ()) not in ((), (1,)):
                    bad.append((path, str(eqn)[:120]))
        for k, v in eqn.params.items():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for item in vals:
                if hasattr(item, "jaxpr"):
                    bad += scan(item.jaxpr, path + "/" + eqn.primitive.name)
    return bad

bad = scan(jaxpr.jaxpr)
print("fwd span bool-selects:", len(bad))
for b in bad[:5]:
    print(" ", b)

# backward body: replay + vjp chain of one bounce
def bwd_one(tab, o, d, thr, alivef, depth, u10, bits, go, gd, gthr, grad):
    used, u_rows = PF.used_offsets(gspec)
    kmap = {k: i for i, k in enumerate(used)}
    zero = jnp.zeros_like(o[0])
    tvals = tuple(tab[k] + zero for k in used)
    def f(o3, d3, thr_, tv):
        out = PF._bounce_core(gspec, lambda k: tv[kmap[k]],
                              {"o": o3, "d": d3, "thr": thr_,
                               "alive": alivef > 0.5, "depth": depth},
                              tuple(u10[k] for k in range(10)), bits)
        return out["o"], out["d"], out["thr"], out["rad_delta"]
    _, vjp = jax.vjp(f, o, d, thr, tvals)
    return vjp((go, gd, gthr, grad))

a3 = tuple(jnp.zeros((T, L)) for _ in range(3))
aB = tuple(jnp.zeros((T, L)) for _ in range(B))
jaxpr2 = jax.make_jaxpr(bwd_one)(
    jnp.zeros((PF.tab_size(gspec),)), a3, a3, aB,
    jnp.zeros((T, L)), jnp.zeros((T, L)), jnp.zeros((10, T, L)),
    jnp.zeros((T, L), jnp.int32), a3, a3, aB, aB)
bad2 = scan(jaxpr2.jaxpr)
print("bwd bounce bool-selects:", len(bad2))
for b in bad2[:5]:
    print(" ", b)
