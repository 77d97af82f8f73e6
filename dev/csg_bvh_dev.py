import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.math.transform import rotate_x, translate
from source_tpu.core.math.vector import Point3D
from source_tpu.core.scenegraph.node import World
from source_tpu.optical.material.lambert import Lambert
from source_tpu.primitive import Box, Sphere, Cylinder
from source_tpu.primitive.csg import Subtract, Intersect, Union
from source_tpu.primitive.lens.spherical import BiConvex, BiConcave, PlanoConvex, Meniscus
from source_tpu.tracer.intersect import intersect_scene

def build(force):
    prev = os.environ.get("SOURCE_TPU_LEAF_BVH")
    os.environ["SOURCE_TPU_LEAF_BVH"] = force
    try:
        w = World()
        rng = np.random.RandomState(0)
        # a grid of lenses (the reference's cooke-triplet geometry class)
        lenses = [BiConvex, BiConcave, PlanoConvex, Meniscus]
        for i in range(8):
            x, y = (i % 3 - 1) * 0.3, (i // 3 - 1) * 0.3
            L = lenses[i % 4]
            if L is BiConvex:
                p = L(0.1, 0.02, 0.3, 0.3)
            elif L is BiConcave:
                p = L(0.1, 0.02, 0.3, 0.3)
            elif L is PlanoConvex:
                p = L(0.1, 0.02, 0.3)
            else:
                p = L(0.1, 0.02, 0.25, 0.3)
            p.parent = w
            p.transform = translate(x, y, 0.4 * i) * rotate_x(float(rng.uniform(0, 20)))
            p.material = Lambert()
        # raw CSG solids too
        Subtract(Sphere(0.5), Box(Point3D(0, -1, -1), Point3D(1, 1, 1)),
                 parent=w, transform=translate(0.0, 1.2, 1.0), material=Lambert())
        Union(Sphere(0.3), Cylinder(0.2, 0.6), parent=w,
              transform=translate(-1.2, 0.0, 1.5), material=Lambert())
        Intersect(Sphere(0.4), Sphere(0.4, transform=translate(0.3, 0, 0)),
                  parent=w, transform=translate(1.2, 0.0, 2.0), material=Lambert())
        # plus plain leaves so both record classes mix
        Sphere(0.25, parent=w, transform=translate(0.0, -1.2, 2.5), material=Lambert())
        Box(Point3D(-0.2,-0.2,-0.2), Point3D(0.2,0.2,0.2), parent=w,
            transform=translate(1.0, 1.0, 3.0), material=Lambert())
        return compile_scene(w, SpectralConfig(400.0, 700.0, 4))
    finally:
        if prev is None: os.environ.pop("SOURCE_TPU_LEAF_BVH", None)
        else: os.environ["SOURCE_TPU_LEAF_BVH"] = prev

s_bvh = build("1")
s_str = build("0")
print("kernel_csg_entities:", s_bvh.kernel_csg_entities)
print("bvh_leaf_ids:", len(s_bvh.bvh_leaf_ids), "n_leaves:", s_bvh.n_leaves)
print("csg sigs:", len(s_bvh.leaf_bvh_meta[6]) if len(s_bvh.leaf_bvh_meta) > 6 else "-")

N = 4096
rng = np.random.RandomState(1)
o = jnp.asarray(rng.uniform(-2.0, 2.0, (N, 3)) * np.array([1, 1, 0.2]) + np.array([0, 0, -1.5]), jnp.float32)
d = rng.normal(size=(N, 3)) + np.array([0, 0, 2.0])
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d, jnp.float32)

r1 = jax.jit(lambda o, d: intersect_scene(s_bvh, o, d))(o, d)
r2 = jax.jit(lambda o, d: intersect_scene(s_str, o, d))(o, d)
h1, h2 = np.asarray(r1.hit), np.asarray(r2.hit)
print("hit match:", (h1 == h2).mean(), "hits:", h1.sum())
m = h1 & h2
for name, tol in [("t", 1e-3), ("entity", 0), ("leaf", 0), ("exiting", 0)]:
    a, b = np.asarray(getattr(r1, name))[m], np.asarray(getattr(r2, name))[m]
    if tol == 0:
        bad = (a != b)
    else:
        bad = ~np.isclose(a, b, rtol=tol, atol=tol)
    print(f"{name}: mismatch {bad.mean():.5f} ({bad.sum()})")
nb = ~np.isclose(np.asarray(r1.normal)[m], np.asarray(r2.normal)[m], atol=2e-3).all(axis=1)
print("normal mismatch:", nb.mean(), nb.sum())
# fast path
r3 = jax.jit(lambda o, d: intersect_scene(s_bvh, o, d, need_grad=False))(o, d)
print("fastpath hit match:", (np.asarray(r3.hit) == h2).mean())
m3 = np.asarray(r3.hit) & h2
print("fastpath t close:", np.isclose(np.asarray(r3.t)[m3], np.asarray(r2.t)[m3], rtol=1e-3, atol=1e-3).mean())
print("fastpath exiting match:", (np.asarray(r3.exiting)[m3] == np.asarray(r2.exiting)[m3]).mean())

# aimed rays: from z=-1.5 toward each entity centre (dense hit coverage)
centres = []
import source_tpu.core.math.batch as vmath
l2w = np.asarray(s_bvh.leaf_l2w)
for g in range(s_bvh.n_leaves):
    centres.append(l2w[g][:3, 3])
centres = np.array(centres)
M = 4096
rng2 = np.random.RandomState(7)
pick = rng2.randint(0, len(centres), M)
o2 = rng2.uniform(-2, 2, (M, 3)) * np.array([1, 1, 0.0]) + np.array([0, 0, -1.5])
tgt = centres[pick] + rng2.normal(scale=0.08, size=(M, 3))
d2 = tgt - o2
d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
o2, d2 = jnp.asarray(o2, jnp.float32), jnp.asarray(d2, jnp.float32)
r1 = jax.jit(lambda o, d: intersect_scene(s_bvh, o, d))(o2, d2)
r2 = jax.jit(lambda o, d: intersect_scene(s_str, o, d))(o2, d2)
h1, h2 = np.asarray(r1.hit), np.asarray(r2.hit)
print("aimed hit match:", (h1 == h2).mean(), "hits:", h1.sum())
m = h1 & h2
for name in ["t", "entity", "leaf", "exiting"]:
    a, b = np.asarray(getattr(r1, name))[m], np.asarray(getattr(r2, name))[m]
    bad = (a != b) if a.dtype != np.float32 else ~np.isclose(a, b, rtol=1e-3, atol=1e-3)
    print(f"aimed {name}: mismatch {bad.sum()}")
nb = ~np.isclose(np.asarray(r1.normal)[m], np.asarray(r2.normal)[m], atol=3e-3).all(axis=1)
print("aimed normal mismatch:", nb.sum())

# rays from INSIDE solids (exit crossings)
o3 = jnp.asarray(centres[:, :] , jnp.float32)
d3 = np.array([[0.0, 0.0, 1.0]] * len(centres))
d3 = jnp.asarray(d3, jnp.float32)
r1i = jax.jit(lambda o, d: intersect_scene(s_bvh, o, d))(o3, d3)
r2i = jax.jit(lambda o, d: intersect_scene(s_str, o, d))(o3, d3)
print("inside hit match:", (np.asarray(r1i.hit) == np.asarray(r2i.hit)).mean())
mi = np.asarray(r1i.hit)
print("inside t close:", np.isclose(np.asarray(r1i.t)[mi], np.asarray(r2i.t)[mi], rtol=1e-3).mean(),
      "exiting match:", (np.asarray(r1i.exiting)[mi] == np.asarray(r2i.exiting)[mi]).mean())

# gradient parity through the index-based recompute
import dataclasses as dc
def loss(scene, o, d):
    rec = intersect_scene(scene, o, d)
    return jnp.sum(jnp.where(rec.hit, rec.t, 0.0))
g1 = jax.grad(lambda p: loss(dc.replace(s_bvh, leaf_params=p), o2, d2))(s_bvh.leaf_params)
g2 = jax.grad(lambda p: loss(dc.replace(s_str, leaf_params=p), o2, d2))(s_str.leaf_params)
a, b = np.asarray(g1), np.asarray(g2)
print("grad finite:", np.isfinite(a).all(), "reldiff:", np.abs(a-b).max()/max(np.abs(b).max(),1e-9))
g1w = jax.grad(lambda p: loss(dc.replace(s_bvh, leaf_w2l=p), o2, d2))(s_bvh.leaf_w2l)
g2w = jax.grad(lambda p: loss(dc.replace(s_str, leaf_w2l=p), o2, d2))(s_str.leaf_w2l)
a, b = np.asarray(g1w), np.asarray(g2w)
print("w2l grad reldiff:", np.abs(a-b).max()/max(np.abs(b).max(),1e-9))
