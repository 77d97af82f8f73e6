import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
sys.argv = ["x"]
import tests.test_mesh_watertight as tw
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.scenegraph import World
from source_tpu.optical.material import AbsorbingSurface
from source_tpu.tracer.intersect import intersect_scene, entity_contains

w = World()
mesh, verts, faces = tw._blob_mesh(parent=w, material=AbsorbingSurface())
scene = compile_scene(w, SpectralConfig(375.0, 740.0, 1))
rng = np.random.RandomState(3)
e0 = verts[faces[:, [0, 1, 2]].ravel()]
e1 = verts[faces[:, [1, 2, 0]].ravel()]
n_f = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
               verts[faces[:, 2]] - verts[faces[:, 0]])
n_f /= np.linalg.norm(n_f, axis=1, keepdims=True)
n_e = np.repeat(n_f, 3, axis=0)
# replicate selection: the earlier part of the test consumed rng draws; re-run them
_ = rng.choice(len(e0), 64, replace=False)
for i in _: rng.normal(scale=0.3, size=3)
_v = rng.choice(len(verts), 32, replace=False)
for i in _v: rng.normal(scale=0.3, size=3)
gsel = rng.choice(len(e0), 48, replace=False)
g_o, g_d = [], []
for i in gsel:
    m = 0.5 * (e0[i] + e1[i]); n = n_e[i]
    tangent = np.cross(n, rng.normal(size=3)); tangent /= np.linalg.norm(tangent)
    dd = tangent - 0.01 * n; dd /= np.linalg.norm(dd)
    g_o.append(m - 6.0 * dd); g_d.append(dd)
o = np.asarray(g_o)[0]; d = np.asarray(g_d)[0]
print("lane0 o", o, "d", d)
# march and print full record
oo = jnp.asarray(o[None], jnp.float32); dd_ = jnp.asarray(d[None], jnp.float32)
s_tot = 0.0
for step in range(6):
    rec = intersect_scene(scene, oo, dd_)
    if not bool(rec.hit[0]): break
    t = float(rec.t[0]); ex = bool(rec.exiting[0]); tri = int(rec.tri[0])
    nrm = np.asarray(rec.normal[0])
    print(f"s={s_tot+t:.6f} t={t:.6f} tri={tri} exiting={ex} n·d={float(np.dot(nrm, d)):.6f}")
    # containment just before/after
    for eps in (-2e-3, 2e-3):
        p = np.asarray(oo[0]) + (t + eps) * d
        c = bool(np.asarray(entity_contains(scene, jnp.asarray(p[None], jnp.float32)))[0,0])
        print(f"   contains(t{eps:+.0e}) = {c}")
    adv = t + 1e-4 * (1 + abs(t))
    s_tot += adv
    oo = oo + adv * dd_
