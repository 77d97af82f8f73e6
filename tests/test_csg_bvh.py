"""Small-CSG entities under the packet-BVH kernel (VERDICT r3 missing #1 /
next #2): lens primitives and raw CSG solids with convex analytic children
are resolved INSIDE tracer/pallas_analytic.py from the children's ray
intervals, and must match the streaming crossing-parity resolve
(tracer/intersect.py, a port of csg.pyx:132-241) record for record —
entity, boundary leaf, crossing t (entry OR exit), exiting flag, normal —
plus identical geometry gradients through the crossing-index recompute.

Reference analogue: the primitive kd-tree accelerates EVERY primitive
type uniformly (core/acceleration/kdtree.pyx:41-180); a lens stack
(CSG of spheres/cylinders, primitive/lens/spherical.pyx:46-466) is the
workload class where this matters.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.math.transform import rotate_x, translate
from source_tpu.core.math.vector import Point3D
from source_tpu.core.scenegraph.node import World
from source_tpu.optical.material.lambert import Lambert
from source_tpu.primitive import Box, Cylinder, Sphere
from source_tpu.primitive.csg import Intersect, Subtract, Union
from source_tpu.primitive.lens.spherical import (
    BiConcave, BiConvex, Meniscus, PlanoConvex,
)
from source_tpu.tracer.intersect import intersect_scene


@pytest.fixture(autouse=True)
def _force_bvh(monkeypatch):
    monkeypatch.setenv("SOURCE_TPU_LEAF_BVH", "1")


def _build(force):
    prev = os.environ.get("SOURCE_TPU_LEAF_BVH")
    os.environ["SOURCE_TPU_LEAF_BVH"] = force
    try:
        w = World()
        rng = np.random.RandomState(0)
        lenses = [BiConvex, BiConcave, PlanoConvex, Meniscus]
        for i in range(8):
            x, y = (i % 3 - 1) * 0.3, (i // 3 - 1) * 0.3
            L = lenses[i % 4]
            if L is PlanoConvex:
                p = L(0.1, 0.02, 0.3)
            elif L is Meniscus:
                p = L(0.1, 0.02, 0.25, 0.3)
            else:
                p = L(0.1, 0.02, 0.3, 0.3)
            p.parent = w
            p.transform = (translate(x, y, 0.4 * i)
                           * rotate_x(float(rng.uniform(0, 20))))
            p.material = Lambert()
        Subtract(Sphere(0.5), Box(Point3D(0, -1, -1), Point3D(1, 1, 1)),
                 parent=w, transform=translate(0.0, 1.2, 1.0),
                 material=Lambert())
        Union(Sphere(0.3), Cylinder(0.2, 0.6), parent=w,
              transform=translate(-1.2, 0.0, 1.5), material=Lambert())
        Intersect(Sphere(0.4), Sphere(0.4, transform=translate(0.3, 0, 0)),
                  parent=w, transform=translate(1.2, 0.0, 2.0),
                  material=Lambert())
        Sphere(0.25, parent=w, transform=translate(0.0, -1.2, 2.5),
               material=Lambert())
        Box(Point3D(-0.2, -0.2, -0.2), Point3D(0.2, 0.2, 0.2), parent=w,
            transform=translate(1.0, 1.0, 3.0), material=Lambert())
        return compile_scene(w, SpectralConfig(400.0, 700.0, 4))
    finally:
        if prev is None:
            os.environ.pop("SOURCE_TPU_LEAF_BVH", None)
        else:
            os.environ["SOURCE_TPU_LEAF_BVH"] = prev


@pytest.fixture(scope="module")
def scenes():
    return _build("1"), _build("0")


def _aimed_rays(scene, n=4096, seed=7):
    """Rays aimed at per-leaf centres for dense hit coverage."""
    l2w = np.asarray(scene.leaf_l2w)
    centres = np.stack([l2w[g][:3, 3] for g in range(scene.n_leaves)])
    rng = np.random.RandomState(seed)
    pick = rng.randint(0, len(centres), n)
    o = rng.uniform(-2, 2, (n, 3)) * np.array([1, 1, 0.0]) + np.array(
        [0, 0, -1.5])
    tgt = centres[pick] + rng.normal(scale=0.08, size=(n, 3))
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            centres)


def test_kernel_covers_all_csg(scenes):
    s_bvh, _ = scenes
    assert len(s_bvh.kernel_csg_entities) == 11  # 8 lenses + 3 raw solids
    assert len(s_bvh.bvh_leaf_ids) == s_bvh.n_leaves  # full coverage
    assert len(s_bvh.leaf_bvh_meta) > 6 and len(s_bvh.leaf_bvh_meta[6]) >= 4


def test_record_parity_aimed(scenes):
    s_bvh, s_str = scenes
    o, d, _ = _aimed_rays(s_bvh)
    r1 = jax.jit(lambda o, d: intersect_scene(s_bvh, o, d))(o, d)
    r2 = jax.jit(lambda o, d: intersect_scene(s_str, o, d))(o, d)
    h1, h2 = np.asarray(r1.hit), np.asarray(r2.hit)
    np.testing.assert_array_equal(h1, h2)
    m = h1
    assert m.sum() > 1000
    np.testing.assert_allclose(np.asarray(r1.t)[m], np.asarray(r2.t)[m],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(r1.entity)[m],
                                  np.asarray(r2.entity)[m])
    np.testing.assert_array_equal(np.asarray(r1.leaf)[m],
                                  np.asarray(r2.leaf)[m])
    np.testing.assert_array_equal(np.asarray(r1.exiting)[m],
                                  np.asarray(r2.exiting)[m])
    np.testing.assert_allclose(np.asarray(r1.normal)[m],
                               np.asarray(r2.normal)[m], atol=3e-3)


def test_inside_origin_exit_crossings(scenes):
    """Rays starting inside CSG solids must report the EXIT boundary with
    exiting=True (the crossing-index recompute path)."""
    s_bvh, s_str = scenes
    l2w = np.asarray(s_bvh.leaf_l2w)
    o = np.stack([l2w[g][:3, 3] for g in range(s_bvh.n_leaves)])
    # displace off the leaf frames' own origin planes: a lens barrel's
    # local origin sits EXACTLY on its cap plane, where the streaming
    # resolve's t>eps crossing filter makes the origin parity inconsistent
    # (real traces never start exactly on a surface — relaunch points are
    # eps-displaced, intersection.pyx:45-50)
    o = jnp.asarray(o + np.array([1.7e-3, 1.3e-3, 2.9e-3]), jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), o.shape)
    r1 = jax.jit(lambda o, d: intersect_scene(s_bvh, o, d))(o, d)
    r2 = jax.jit(lambda o, d: intersect_scene(s_str, o, d))(o, d)
    np.testing.assert_array_equal(np.asarray(r1.hit), np.asarray(r2.hit))
    m = np.asarray(r1.hit)
    np.testing.assert_allclose(np.asarray(r1.t)[m], np.asarray(r2.t)[m],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(r1.exiting)[m],
                                  np.asarray(r2.exiting)[m])


def test_gradient_parity(scenes):
    import dataclasses as dc

    s_bvh, s_str = scenes
    o, d, _ = _aimed_rays(s_bvh, n=1024, seed=3)

    def loss(scene):
        rec = intersect_scene(scene, o, d)
        return jnp.sum(jnp.where(rec.hit, rec.t, 0.0))

    for field in ("leaf_params", "leaf_w2l"):
        g1 = jax.grad(lambda p: loss(dc.replace(s_bvh, **{field: p})))(
            getattr(s_bvh, field))
        g2 = jax.grad(lambda p: loss(dc.replace(s_str, **{field: p})))(
            getattr(s_str, field))
        a, b = np.asarray(g1), np.asarray(g2)
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3, err_msg=field)
