"""Locate the NaN in the multi-bounce span backward (zoo scene).

Mirrors _span_bwd_kernel in pure JAX: replay forward from the span entry
state saving per-bounce entry states, then reverse-vjp per bounce, checking
finiteness of every cotangent at every bounce.
"""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["SOURCE_TPU_FUSED"] = "1"
import numpy as np, jax, jax.numpy as jnp

from tests.test_fused import _rays, _cfg
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.math.transform import rotate_x, translate
from source_tpu.core.math.vector import Point3D
from source_tpu.core.scenegraph.node import World
from source_tpu.optical import InterpolatedSF
from source_tpu.optical.material import (
    AbsorbingSurface, AnisotropicSurfaceEmitter, Checkerboard, Conductor,
    Lambert, NullSurface, PerfectReflectingSurface, RoughConductor,
    UniformSurfaceEmitter, UniformVolumeEmitter,
)
from source_tpu.primitive import Box, Cone, Cylinder, Parabola, Sphere

B = 5
w = World()
ns = InterpolatedSF([400, 700], [1.2, 1.1])
ks = InterpolatedSF([400, 700], [5.0, 4.0])
spec = InterpolatedSF([400, 700], [1.0, 3.0])
mats = [
    Conductor(ns, ks), RoughConductor(ns, ks, 0.3),
    AnisotropicSurfaceEmitter(spec, 1.0, 2.0),
    Checkerboard(0.3, spec, InterpolatedSF([400, 700], [3.0, 1.0]), 1.0),
    PerfectReflectingSurface(), NullSurface(), AbsorbingSurface(),
    UniformVolumeEmitter(spec, 0.7), Lambert(InterpolatedSF([400, 700], [0.4, 0.6])),
]
rng = np.random.RandomState(5)
for i, mat in enumerate(mats):
    x, y, z = rng.uniform(-2.0, 2.0, 3)
    t = translate(x, y, z) * rotate_x(float(rng.uniform(0, 90)))
    kind = i % 5
    if kind == 0: Sphere(0.5, parent=w, transform=t, material=mat)
    elif kind == 1: Box(Point3D(-0.4, -0.3, -0.2), Point3D(0.4, 0.3, 0.2), parent=w, transform=t, material=mat)
    elif kind == 2: Cylinder(0.35, 0.7, parent=w, transform=t, material=mat)
    elif kind == 3: Cone(0.35, 0.6, parent=w, transform=t, material=mat)
    else: Parabola(0.35, 0.5, parent=w, transform=t, material=mat)
Box(Point3D(-3, -3, 4.0), Point3D(3, 3, 4.1), parent=w, material=UniformSurfaceEmitter(spec, 2.0))
scene = compile_scene(w, SpectralConfig(375.0, 740.0, B))

from source_tpu.tracer import pallas_fused as PF
from source_tpu.tracer.wavefront import RayConfig, init_rays

cfg = _cfg(compact_schedule=())  # one span of max_iters bounces, simpler
o, d = _rays(256, seed=2)
key = jax.random.PRNGKey(13)
st0 = init_rays(o, d, B)

spec_f = PF.fused_spec(scene, cfg)
gspec = PF.general_spec(spec_f)
n_u = 10
n_steps = cfg.max_iters
u_all = jax.random.uniform(jax.random.fold_in(key, 0x7A000), (n_steps, 256, n_u), jnp.float32)

tabvec = PF.pack_tabvec(scene, gspec)
packed, n = PF._pack_state(st0)
u_p = PF._pack_u(u_all)

# forward with bits (per-bounce calls, trusted)
sts = []
bits_all = []
stc = packed
for i in range(n_steps):
    sts.append(stc)
    stc, bits = PF._bounce_fwd_call(gspec, tabvec, stc, u_p[i])
    bits_all.append(bits)

# replay from entry like the multi bwd does, compare states
B_ = gspec.bins
state = {"o": tuple(packed["o"][c] for c in range(3)),
         "d": tuple(packed["d"][c] for c in range(3)),
         "thr": tuple(packed["thr"][b] for b in range(B_)),
         "alive": packed["aux"][0] > 0.5, "depth": packed["aux"][1]}
tget = lambda k: tabvec[k]
replayed = []
for i in range(n_steps):
    replayed.append({"o": state["o"], "d": state["d"], "thr": state["thr"],
                     "alive": state["alive"], "depth": state["depth"]})
    # compare replay state vs forward save
    ref = sts[i]
    diffs = {
        "o": max(float(jnp.abs(state["o"][c] - ref["o"][c]).max()) for c in range(3)),
        "d": max(float(jnp.abs(state["d"][c] - ref["d"][c]).max()) for c in range(3)),
        "thr": max(float(jnp.abs(state["thr"][b] - ref["thr"][b]).max()) for b in range(B_)),
        "alive": float(jnp.abs(jnp.where(state["alive"],1.,0.) - ref["aux"][0]).max()),
        "depth": float(jnp.abs(state["depth"] - ref["aux"][1]).max()),
    }
    bad = {k: v for k, v in diffs.items() if v > 0}
    if bad:
        print(f"bounce {i}: replay diverges: {bad}", flush=True)
    u = tuple(u_p[i][k] for k in range(10))
    out = PF._bounce_core(gspec, tget, state, u, bits_all[i])
    state = {"o": out["o"], "d": out["d"], "thr": out["thr"],
             "alive": out["alive_next"], "depth": out["depth"]}

# now reverse vjp per bounce from zero-ish cotangents, checking finiteness
used, u_rows = PF.used_offsets(gspec)
kmap = {k: j for j, k in enumerate(used)}
go = tuple(jnp.zeros_like(packed["o"][c]) for c in range(3))
gd = tuple(jnp.zeros_like(packed["o"][0]) for _ in range(3))
gthr = tuple(jnp.zeros_like(packed["o"][0]) for _ in range(B_))
grad = tuple(jnp.ones_like(packed["o"][0]) for _ in range(B_))  # rad cotangent 1
zero = jnp.zeros_like(packed["o"][0])
for j in range(n_steps):
    i = n_steps - 1 - j
    rep = replayed[i]
    o3, d3, thr = rep["o"], rep["d"], rep["thr"]
    alive, depth = rep["alive"], rep["depth"]
    u = tuple(u_p[i][k] for k in range(10))
    bits = bits_all[i]
    tvals = tuple(tabvec[k] + zero for k in used)
    def f(o3_, d3_, thr_, tv):
        out = PF._bounce_core(gspec, lambda k: tv[kmap[k]],
                              {"o": o3_, "d": d3_, "thr": thr_,
                               "alive": alive, "depth": depth}, u, bits)
        return out["o"], out["d"], out["thr"], out["rad_delta"]
    _, vjp = jax.vjp(f, o3, d3, thr, tvals)
    ngo, ngd, ngthr, gtv = vjp((go, gd, gthr, grad))
    def chk(name, tup):
        for c, x in enumerate(tup):
            if not bool(jnp.isfinite(x).all()):
                idx = np.unravel_index(int(jnp.argmax(~jnp.isfinite(x))), x.shape)
                print(f"bounce {i}: NaN in {name}[{c}] at {idx}", flush=True)
                return True
        return False
    bad = chk("go", ngo) or chk("gd", ngd) or chk("gthr", ngthr)
    # check gtv only for w2l offsets (k < 20*L, k%20 < 12)
    L = len(gspec.leaves)
    for jj, k in enumerate(used):
        if k < 20 * L and (k % 20) < 12:
            if not bool(jnp.isfinite(gtv[jj]).all()):
                g_ = gspec.leaves[k // 20]
                print(f"bounce {i}: NaN in w2l cotangent offset {k} (leaf {k//20} type {g_[0]})", flush=True)
                bad = True
                break
    if bad:
        break
    go, gd, gthr = ngo, ngd, ngthr
print("done", flush=True)
