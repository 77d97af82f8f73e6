"""Host-side interactive query API: core Ray, World.hit, World.contains
(reference core/ray.pyx:37-145, core/scenegraph/world.pyx:125-163)."""

import math

import pytest

from source_tpu.core import Ray, World, Point3D, Vector3D, translate
from source_tpu.core.math import mm, km, radian, degree
from source_tpu.optical import ConstantSF
from source_tpu.optical.material import Lambert
from source_tpu.primitive import Box, Sphere


def _world_with_sphere():
    w = World()
    s = Sphere(0.5, parent=w, transform=translate(0, 0, 2),
               material=Lambert(ConstantSF(0.5)))
    return w, s


class TestRay:
    def test_point_on(self):
        r = Ray(Point3D(1, 2, 3), Vector3D(0, 0, 2))
        p = r.point_on(2.0)
        assert (p.x, p.y, p.z) == (1, 2, 7)

    def test_copy_and_validation(self):
        r = Ray(Point3D(0, 0, 0), Vector3D(1, 0, 0), max_distance=5.0)
        c = r.copy()
        assert c.max_distance == 5.0 and c.origin is not r.origin
        with pytest.raises(ValueError):
            Ray(max_distance=0.0)


class TestWorldHit:
    def test_hit_front(self):
        w, s = _world_with_sphere()
        ix = w.hit(Ray(Point3D(0, 0, 0), Vector3D(0, 0, 1)))
        assert ix is not None
        assert ix.primitive is s
        assert ix.ray_distance == pytest.approx(1.5, abs=1e-4)
        # local-space hit point and OUTWARD normal (sphere.pyx:183-197)
        assert ix.hit_point.z == pytest.approx(-0.5, abs=1e-4)
        assert ix.normal.z == pytest.approx(-1.0, abs=1e-4)
        assert not ix.exiting

    def test_hit_exiting_from_inside(self):
        w, s = _world_with_sphere()
        ix = w.hit(Ray(Point3D(0, 0, 2), Vector3D(0, 0, 1)))
        assert ix is not None and ix.exiting
        assert ix.ray_distance == pytest.approx(0.5, abs=1e-4)
        assert ix.normal.z == pytest.approx(1.0, abs=1e-4)

    def test_unnormalised_direction_gives_parametric_distance(self):
        w, _ = _world_with_sphere()
        ix = w.hit(Ray(Point3D(0, 0, 0), Vector3D(0, 0, 3)))
        assert ix.ray_distance == pytest.approx(0.5, abs=1e-4)

    def test_miss_and_max_distance(self):
        w, _ = _world_with_sphere()
        assert w.hit(Ray(Point3D(0, 0, 0), Vector3D(0, 1, 0))) is None
        assert w.hit(Ray(Point3D(0, 0, 0), Vector3D(0, 0, 1),
                         max_distance=1.0)) is None

    def test_rebuild_after_geometry_change(self):
        w, s = _world_with_sphere()
        assert w.hit(Ray(Point3D(0, 0, 0), Vector3D(0, 0, 1))) is not None
        s.transform = translate(0, 5, 2)  # GEOMETRY signal -> recompile
        assert w.hit(Ray(Point3D(0, 0, 0), Vector3D(0, 0, 1))) is None
        assert w.hit(Ray(Point3D(0, 5, 0), Vector3D(0, 0, 1))) is not None


class TestWorldContains:
    def test_contains(self):
        w, s = _world_with_sphere()
        b = Box(Point3D(-3, -3, -3), Point3D(3, 3, 3), parent=w,
                material=Lambert(ConstantSF(0.5)))
        found = w.contains(Point3D(0, 0, 2))
        assert s in found and b in found
        assert w.contains(Point3D(0, 0, 10)) == []


class TestUnits:
    def test_short_names(self):
        assert mm(10) == pytest.approx(0.01)
        assert km(1) == 1000.0

    def test_radian_matches_reference(self):
        # units.pyx:135 — radians IN, degrees OUT
        assert radian(math.pi) == pytest.approx(180.0)
        assert degree(180.0) == pytest.approx(math.pi)


def test_optical_ray_sample_furnace():
    """optical.Ray.sample in a unity furnace returns exactly 1.0 per bin
    (reference optical/ray.pyx:459-504 sampling API)."""
    import numpy as np

    from source_tpu.core.scenegraph import World
    from source_tpu.optical import Ray as OpticalRay
    from source_tpu.optical.material import UnitySurfaceEmitter
    from source_tpu.primitive import Sphere

    w = World()
    Sphere(radius=5.0, parent=w, material=UnitySurfaceEmitter())
    ray = OpticalRay(origin=(0, 0, 0), direction=(0, 0, 1), bins=6,
                     extinction_prob=0.0, max_depth=4)
    spec = ray.sample(w, 64, seed=3)
    assert spec.bins == 6
    np.testing.assert_allclose(spec.samples, 1.0, atol=1e-5)
    assert ray.ray_count >= 64
    one = ray.trace(w, seed=4)
    np.testing.assert_allclose(one.samples, 1.0, atol=1e-5)
    # copy preserves the spectral configuration
    r2 = ray.copy(origin=(1, 0, 0))
    assert r2.bins == ray.bins and r2.max_depth == ray.max_depth
