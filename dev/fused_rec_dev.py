import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from demos.cornell_box import build_world
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.tracer.wavefront import RayConfig
from source_tpu.tracer.intersect import intersect_scene
from source_tpu.tracer import pallas_fused as pf

B = 5
world = build_world(glass=True)
scene = compile_scene(world, SpectralConfig(375.0, 740.0, B))
cfg = RayConfig(max_depth=8, max_iters=10)
spec = pf.fused_spec(scene, cfg)
tab = pf.pack_tabvec(scene, spec)

N = 256
rng = np.random.RandomState(0)
o = jnp.asarray(np.concatenate([rng.uniform(-0.9, 0.9, (N, 2)), np.full((N,1), -2.5)], axis=1), jnp.float32)
d = rng.normal(size=(N, 3)) + np.array([0, 0, 4.0])
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d, jnp.float32)

rec = intersect_scene(scene, o, d)

# fused-side intersection: replicate the leaf loop from _bounce_core
tget = lambda k: tab[k]
oc = (o[:,0], o[:,1], o[:,2]); dc = (d[:,0], d[:,1], d[:,2])
eps = pf._T_EPS * jnp.maximum(1.0, jnp.maximum(jnp.abs(oc[0]), jnp.maximum(jnp.abs(oc[1]), jnp.abs(oc[2]))))
t_leaf, ins_leaf, nrm_leaf = [], [], []
L = len(spec.leaves)
for g, (tid, _e, _m) in enumerate(spec.leaves):
    off = pf._off_leaf(spec, g)
    m12, lo, ld = pf._leaf_local(tget, off, oc, dc)
    pp = [tget(off + 12 + k) for k in range(8)]
    t_g, ins_g = pf._HIT[tid](lo, ld, pp, eps)
    t_s = jnp.where(t_g < 1e30, t_g, 0.0)
    ph = (lo[0] + t_s*ld[0], lo[1] + t_s*ld[1], lo[2] + t_s*ld[2])
    nl = pf._NORMAL[tid](ph, pp)
    nw = (m12[0]*nl[0] + m12[4]*nl[1] + m12[8]*nl[2],
          m12[1]*nl[0] + m12[5]*nl[1] + m12[9]*nl[2],
          m12[2]*nl[0] + m12[6]*nl[1] + m12[10]*nl[2])
    t_leaf.append(t_g); ins_leaf.append(ins_g); nrm_leaf.append(nw)
t_best = jnp.full_like(oc[0], pf._BIG); win = jnp.zeros_like(oc[0], dtype=jnp.int32)
for g in range(L):
    better = t_leaf[g] < t_best
    t_best = jnp.where(better, t_leaf[g], t_best); win = jnp.where(better, g, win)
hit = t_best < 1e30
nx = sum(jnp.where(win==g, nrm_leaf[g][0], 0.0) for g in range(L))
ny = sum(jnp.where(win==g, nrm_leaf[g][1], 0.0) for g in range(L))
nz = sum(jnp.where(win==g, nrm_leaf[g][2], 0.0) for g in range(L))
nx, ny, nz = pf._norm3(nx, ny, nz)
ins = sum(jnp.where(win==g, ins_leaf[g], False) for g in range(L))

# map leaf -> entity for comparison
ent_of = {g: e for g, (t, e, m) in enumerate(spec.leaves)}
win_np = np.asarray(win); hit_np = np.asarray(hit)
ent_got = np.array([ent_of[int(g)] for g in win_np])
print("hit match:", (np.asarray(rec.hit) == hit_np).mean())
m = np.asarray(rec.hit) & hit_np
print("entity match:", (np.asarray(rec.entity)[m] == ent_got[m]).mean())
print("t close:", np.isclose(np.asarray(rec.t)[m], np.asarray(t_best)[m], rtol=1e-4, atol=1e-4).mean())
n_ref = np.asarray(rec.normal)
n_got = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], axis=-1)
ok = np.isclose(n_ref[m], n_got[m], rtol=1e-3, atol=1e-3).all(axis=1)
print("normal close:", ok.mean())
bad = np.where(m)[0][~ok][:8]
for l in bad:
    print(f"lane {l} leaf {win_np[l]} t {np.asarray(t_best)[l]:.4f}/{np.asarray(rec.t)[l]:.4f} n_ref={n_ref[l]} n_got={n_got[l]} exiting_ref={np.asarray(rec.exiting)[l]} ins_got={np.asarray(ins)[l]}")

# apply bounce_core's flip and compare n_sh + sampled lambert direction
dn = dc[0]*nx + dc[1]*ny + dc[2]*nz
exiting = ins > 0
flip = jnp.where(exiting, dn < 0.0, dn > 0.0)
fs = jnp.where(flip, -1.0, 1.0)
nX, nY, nZ = nx*fs, ny*fs, nz*fs
cos_in = -(dn*fs)
front = cos_in >= 0
nsx = jnp.where(front, nX, -nX); nsy = jnp.where(front, nY, -nY); nsz = jnp.where(front, nZ, -nZ)
n_flip = np.stack([np.asarray(nX), np.asarray(nY), np.asarray(nZ)], axis=-1)
ok2 = np.isclose(n_ref[m], n_flip[m], rtol=1e-3, atol=1e-3).all(axis=1)
print("flipped normal close:", ok2.mean())

# reference shading frame vs mine
from source_tpu.core.math import batch as vmath
cos_in_ref = -np.sum(np.asarray(d) * n_ref, axis=-1)
n_sh_ref = np.where(cos_in_ref[:, None] >= 0, n_ref, -n_ref)
n_sh_got = np.stack([np.asarray(nsx), np.asarray(nsy), np.asarray(nsz)], axis=-1)
ok3 = np.isclose(n_sh_ref[m], n_sh_got[m], rtol=1e-3, atol=1e-3).all(axis=1)
print("n_sh close:", ok3.mean())

u1 = jnp.asarray(rng.uniform(size=N), jnp.float32); u2 = jnp.asarray(rng.uniform(size=N), jnp.float32)
# reference lambert direction
from source_tpu.core.math import random as vrand
t_r, b_r, n_r = vmath.make_frame(jnp.asarray(n_sh_ref))
dir_ref = vmath.from_frame(vrand.vector_hemisphere_cosine(u1, u2), t_r, b_r, n_r)
# mine
tf, bf, nf = pf._make_frame(nsx, nsy, nsz)
dg = pf._from_frame(pf._hemisphere_cosine(u1, u2), tf, bf, nf)
dir_got = np.stack([np.asarray(dg[0]), np.asarray(dg[1]), np.asarray(dg[2])], axis=-1)
ok4 = np.isclose(np.asarray(dir_ref)[m], dir_got[m], rtol=1e-3, atol=1e-3).all(axis=1)
print("lambert dir close:", ok4.mean())
bad4 = np.where(m)[0][~ok4][:5]
for l in bad4:
    print(f"lane {l}: n_sh_ref={n_sh_ref[l]} n_sh_got={n_sh_got[l]} dir_ref={np.asarray(dir_ref)[l]} dir_got={dir_got[l]}")
