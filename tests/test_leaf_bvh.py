"""Analytic leaf-BVH parity: the packet-culled path must reproduce the
streaming path exactly (winner, t, entity, leaf, exiting, normals) and
carry identical gradients through the winner recompute.

Reference analogue: the primitive kd-tree accelerator
(raysect/core/acceleration/kdtree.pyx:41-180) must return the same
intersections as brute force — its test strategy is image equality; here
we assert record-level equality against the linear streaming path.
"""

import os

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _force_bvh(monkeypatch):
    # trace-time opt-in: off-TPU the tracer only takes the packet-kernel
    # path (interpret mode) under this override — scoped to THIS module so
    # the rest of the CPU suite keeps the fast streaming path
    monkeypatch.setenv("SOURCE_TPU_LEAF_BVH", "1")

import jax
import jax.numpy as jnp

from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.math.transform import rotate_x, translate
from source_tpu.core.math.vector import Point3D
from source_tpu.core.scenegraph.node import World
from source_tpu.optical.material.lambert import Lambert
from source_tpu.primitive.shapes import (
    Box, Cone, Cylinder, Parabola, Sphere, Torus,
)
from source_tpu.tracer.intersect import intersect_scene


def _scene(force):
    prev = os.environ.get("SOURCE_TPU_LEAF_BVH")
    os.environ["SOURCE_TPU_LEAF_BVH"] = force
    try:
        w = World()
        rng = np.random.RandomState(0)
        for i in range(14):
            x, y, z = rng.uniform(-3.0, 3.0, 3)
            t = translate(x, y, z) * rotate_x(float(rng.uniform(0, 90)))
            kind = i % 5
            if kind == 0:
                Sphere(0.4, parent=w, transform=t, material=Lambert())
            elif kind == 1:
                Box(Point3D(-0.3, -0.3, -0.3), Point3D(0.3, 0.3, 0.3),
                    parent=w, transform=t, material=Lambert())
            elif kind == 2:
                Cylinder(0.3, 0.6, parent=w, transform=t, material=Lambert())
            elif kind == 3:
                Cone(0.3, 0.6, parent=w, transform=t, material=Lambert())
            else:
                Parabola(0.3, 0.5, parent=w, transform=t, material=Lambert())
        # a torus (now an inline quartic BVH leaf, VERDICT r4 #5) and a
        # non-convex-friendly CSG solid ride alongside
        Torus(0.5, 0.15, parent=w, transform=translate(0.0, 0.0, 4.0),
              material=Lambert())
        from source_tpu.primitive.csg import Subtract
        Subtract(
            Sphere(0.5), Box(Point3D(0, -1, -1), Point3D(1, 1, 1)),
            parent=w, transform=translate(0.0, 4.0, 0.0), material=Lambert(),
        )
        return compile_scene(w, SpectralConfig(400.0, 700.0, 4))
    finally:
        if prev is None:
            os.environ.pop("SOURCE_TPU_LEAF_BVH", None)
        else:
            os.environ["SOURCE_TPU_LEAF_BVH"] = prev


@pytest.fixture(scope="module")
def scenes():
    return _scene("1"), _scene("0")


def _rays(n=2048, seed=1):
    rng = np.random.RandomState(seed)
    o = jnp.asarray(rng.uniform(-4.0, 4.0, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d, jnp.float32)


def test_bvh_is_built(scenes):
    s_bvh, s_str = scenes
    assert s_bvh.leaf_bvh is not None
    assert s_str.leaf_bvh is None
    n_nodes, max_leaf, present = s_bvh.leaf_bvh_meta[:3]
    assert n_nodes >= 3 and max_leaf >= 1
    # kernel record codes: 0-5 general local-frame (5 = torus quartic),
    # 6/7 world-space fast, 8 small-CSG interval records
    assert set(present) <= {0, 1, 2, 3, 4, 5, 6, 7, 8}
    assert 5 in present  # the torus is an inline BVH leaf now
    # rigid spheres in this scene take the world-sphere fast record
    assert 6 in present
    # the convex-children CSG solid takes a kernel interval record
    assert 8 in present and len(s_bvh.kernel_csg_entities) == 1
    # the recompute dispatch list keeps the ORIGINAL analytic types
    assert set(s_bvh.leaf_bvh_meta[5]) <= {0, 1, 2, 3, 4, 5}
    # torus included; the covered CSG children count as kernel-covered
    assert len(s_bvh.bvh_leaf_ids) == 17


def test_record_parity(scenes):
    s_bvh, s_str = scenes
    o, d = _rays()
    r1 = jax.jit(lambda o, d: intersect_scene(s_bvh, o, d))(o, d)
    r2 = jax.jit(lambda o, d: intersect_scene(s_str, o, d))(o, d)
    h1, h2 = np.asarray(r1.hit), np.asarray(r2.hit)
    np.testing.assert_array_equal(h1, h2)
    m = h1
    assert m.sum() > 50  # the sweep actually hits things
    # 1e-3: the torus quartic amplifies the ulp-level FMA-contraction
    # differences between the two compiled programs by its conditioning
    # (~1e3); the quadratic solids agree to ~1e-6
    np.testing.assert_allclose(
        np.asarray(r1.t)[m], np.asarray(r2.t)[m], rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(r1.entity)[m], np.asarray(r2.entity)[m])
    np.testing.assert_array_equal(
        np.asarray(r1.leaf)[m], np.asarray(r2.leaf)[m])
    np.testing.assert_array_equal(
        np.asarray(r1.exiting)[m], np.asarray(r2.exiting)[m])
    # unit normals: atol is the meaningful bound; 5e-3 covers the torus
    # lanes where the ~1e-3 quartic-t difference is divided by the minor
    # radius in the spine-projection normal
    np.testing.assert_allclose(
        np.asarray(r1.normal)[m], np.asarray(r2.normal)[m],
        rtol=1e-3, atol=5e-3)


def test_gradient_parity(scenes):
    """Geometry gradients flow through the winner recompute identically to
    the streaming path (piecewise-constant argmin, differentiable value)."""
    s_bvh, s_str = scenes
    o, d = _rays(512, seed=2)

    def loss(scene):
        rec = intersect_scene(scene, o, d)
        return jnp.sum(jnp.where(rec.hit, rec.t, 0.0))

    import dataclasses as dc

    g1 = jax.grad(
        lambda p: loss(dc.replace(s_bvh, leaf_params=p)))(s_bvh.leaf_params)
    g2 = jax.grad(
        lambda p: loss(dc.replace(s_str, leaf_params=p)))(s_str.leaf_params)
    assert np.isfinite(np.asarray(g1)).all()
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-3, atol=2e-3)


def test_inside_rays_exit_correctly(scenes):
    """Rays starting inside a leaf must report the exit crossing with
    exiting=True on both paths (covers _leaf_contains_single)."""
    s_bvh, s_str = scenes
    # fire from each entity's local origin outward along +z
    o = jnp.zeros((8, 3), jnp.float32)
    # place origins at the first sphere's centre (entity 0 transform origin)
    # by sampling points near known leaf centres via l2w translation column
    centres = np.asarray(s_bvh.leaf_l2w)[:8, :3, 3]
    o = jnp.asarray(centres, jnp.float32)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (8, 3))
    r1 = jax.jit(lambda o, d: intersect_scene(s_bvh, o, d))(o, d)
    r2 = jax.jit(lambda o, d: intersect_scene(s_str, o, d))(o, d)
    np.testing.assert_array_equal(np.asarray(r1.hit), np.asarray(r2.hit))
    np.testing.assert_array_equal(
        np.asarray(r1.exiting), np.asarray(r2.exiting))
    m = np.asarray(r1.hit)
    np.testing.assert_allclose(
        np.asarray(r1.t)[m], np.asarray(r2.t)[m], rtol=1e-4, atol=1e-4)


def _covered_scene(force):
    """A scene the BVH covers COMPLETELY (no torus, no CSG) so the
    forward-only fast path (need_grad=False) engages."""
    prev = os.environ.get("SOURCE_TPU_LEAF_BVH")
    os.environ["SOURCE_TPU_LEAF_BVH"] = force
    try:
        w = World()
        rng = np.random.RandomState(3)
        for i in range(12):
            x, y, z = rng.uniform(-3.0, 3.0, 3)
            t = translate(x, y, z) * rotate_x(float(rng.uniform(0, 90)))
            kind = i % 5
            if kind == 0:
                Sphere(0.5, parent=w, transform=t, material=Lambert())
            elif kind == 1:
                Box(Point3D(-0.4, -0.3, -0.2), Point3D(0.4, 0.3, 0.2),
                    parent=w, transform=t, material=Lambert())
            elif kind == 2:
                Cylinder(0.3, 0.7, parent=w, transform=t, material=Lambert())
            elif kind == 3:
                Cone(0.35, 0.6, parent=w, transform=t, material=Lambert())
            else:
                Parabola(0.3, 0.5, parent=w, transform=t, material=Lambert())
        return compile_scene(w, SpectralConfig(400.0, 700.0, 4))
    finally:
        if prev is None:
            os.environ.pop("SOURCE_TPU_LEAF_BVH", None)
        else:
            os.environ["SOURCE_TPU_LEAF_BVH"] = prev


def test_fast_path_record_parity():
    """need_grad=False on a fully-covered scene consumes the kernel's OWN
    record (t/entity/normal/exiting — no differentiable recompute); it must
    match the streaming path field for field (ADVICE r3: production
    trace_rays uses exactly this path on TPU)."""
    s_bvh = _covered_scene("1")
    s_str = _covered_scene("0")
    assert s_bvh.leaf_bvh is not None
    assert len(s_bvh.bvh_leaf_ids) == s_bvh.n_leaves  # full coverage
    o, d = _rays(2048, seed=4)
    r1 = jax.jit(
        lambda o, d: intersect_scene(s_bvh, o, d, need_grad=False))(o, d)
    r2 = jax.jit(lambda o, d: intersect_scene(s_str, o, d))(o, d)
    h1, h2 = np.asarray(r1.hit), np.asarray(r2.hit)
    np.testing.assert_array_equal(h1, h2)
    m = h1
    assert m.sum() > 50
    np.testing.assert_allclose(
        np.asarray(r1.t)[m], np.asarray(r2.t)[m], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(r1.entity)[m], np.asarray(r2.entity)[m])
    np.testing.assert_array_equal(
        np.asarray(r1.leaf)[m], np.asarray(r2.leaf)[m])
    np.testing.assert_array_equal(
        np.asarray(r1.exiting)[m], np.asarray(r2.exiting)[m])
    # unit normals: atol is the meaningful bound; 5e-3 covers the torus
    # lanes where the ~1e-3 quartic-t difference is divided by the minor
    # radius in the spine-projection normal
    np.testing.assert_allclose(
        np.asarray(r1.normal)[m], np.asarray(r2.normal)[m],
        rtol=1e-3, atol=5e-3)
    # relaunch points derive from the kernel record on the fast path
    np.testing.assert_allclose(
        np.asarray(r1.outside_point)[m], np.asarray(r2.outside_point)[m],
        rtol=1e-3, atol=1e-3)
