"""Units, polygon triangulation, bounding volumes, LoggingRay, engines."""

import numpy as np

from source_tpu.core.boundingbox import BoundingBox2D, BoundingBox3D, BoundingSphere3D
from source_tpu.core.math.polygon import triangulate2d
from source_tpu.core.math import units
from source_tpu.core.math.vector import Point3D


def test_units():
    assert units.kilometre(2) == 2000
    assert units.millimetre(3) == 0.003
    assert abs(units.inch(1) - 0.0254) < 1e-12
    assert abs(units.degree(180) - np.pi) < 1e-12
    assert abs(units.mile(1) - 1609.344) < 1e-9


def test_triangulate_square():
    tris = triangulate2d([[0, 0], [1, 0], [1, 1], [0, 1]])
    assert tris.shape == (2, 3)
    # total area preserved
    poly = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    area = 0.0
    for t in tris:
        a, b, c = poly[t]
        area += 0.5 * abs((b[0]-a[0])*(c[1]-a[1]) - (b[1]-a[1])*(c[0]-a[0]))
    assert abs(area - 1.0) < 1e-12


def test_triangulate_concave():
    # L-shaped polygon, area = 3
    poly = [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]]
    tris = triangulate2d(poly)
    assert tris.shape == (4, 3)
    p = np.asarray(poly, float)
    area = sum(
        0.5 * abs((p[b][0]-p[a][0])*(p[c][1]-p[a][1]) - (p[b][1]-p[a][1])*(p[c][0]-p[a][0]))
        for a, b, c in tris
    )
    assert abs(area - 3.0) < 1e-12


def test_boundingbox3d():
    box = BoundingBox3D()
    assert box.is_empty
    box.extend(Point3D(0, 0, 0))
    box.extend(Point3D(1, 2, 3))
    assert not box.is_empty
    assert box.contains((0.5, 1.0, 1.5))
    assert not box.contains((2, 0, 0))
    assert abs(box.volume() - 6.0) < 1e-12
    assert abs(box.surface_area() - 2 * (2 + 6 + 3)) < 1e-12
    assert box.largest_axis() == 2
    hit, tn, tf = box.hit((0.5, 1.0, -1.0), (0, 0, 1))
    assert hit and abs(tn - 1.0) < 1e-12
    s = box.enclosing_sphere()
    assert s.contains(Point3D(1, 2, 3), tolerance=1e-9)

    other = BoundingBox3D(Point3D(-1, -1, -1), Point3D(0, 0, 0))
    box.union(other)
    assert box.contains((-0.5, -0.5, -0.5))


def test_boundingsphere_union():
    a = BoundingSphere3D(Point3D(0, 0, 0), 1.0)
    b = BoundingSphere3D(Point3D(3, 0, 0), 1.0)
    a.union(b)
    assert a.contains(Point3D(-1, 0, 0), 1e-9)
    assert a.contains(Point3D(4, 0, 0), 1e-9)
    assert abs(a.radius - 2.5) < 1e-9


def test_boundingbox2d():
    box = BoundingBox2D()
    box.extend((0, 0))
    box.extend((2, 3))
    assert box.contains((1, 1))
    assert abs(box.surface_area() - 6.0) < 1e-12


def test_logging_ray():
    from source_tpu.core.scenegraph import World
    from source_tpu.optical.loggingray import LoggingRay
    from source_tpu.optical.material import PerfectReflectingSurface, UnitySurfaceEmitter
    from source_tpu.primitive import Box, Sphere

    w = World()
    Sphere(radius=5.0, parent=w, material=UnitySurfaceEmitter())
    Box(lower=Point3D(-1, -1, 2), upper=Point3D(1, 1, 2.5), parent=w,
        material=PerfectReflectingSurface())
    ray = LoggingRay(origin=(0, 0, 0), direction=(0, 0, 1), bins=4, max_depth=8)
    spectrum = ray.trace(w)
    assert np.allclose(spectrum, 1.0, atol=1e-4)  # mirror then emitter
    # path: launch, mirror hit at z=2, then emitter hit behind (z=-5)
    assert len(ray.path_vertices) >= 3
    assert abs(ray.path_vertices[1][2] - 2.0) < 1e-3
    assert ray.path_vertices[2][2] < 0
    # full per-vertex records (loggingray.pyx:45-202 parity): entity and
    # material ids, world normal, exiting flag, throughput per bounce
    recs = ray.path_intersections
    assert len(recs) == len(ray.path_vertices) - 1
    assert recs[0]["entity"] == 1 and recs[1]["entity"] == 0
    assert recs[0]["material"] != recs[1]["material"]
    # mirror hit from outside: not exiting, normal faces the ray (-z)
    assert not recs[0]["exiting"]
    assert abs(recs[0]["normal"][2] + 1.0) < 1e-4
    # lossless mirror: throughput at the second segment start is still 1
    assert np.allclose(recs[1]["throughput"], 1.0, atol=1e-5)


def test_render_engines():
    from source_tpu.parallel.engine import SerialEngine

    results = []
    SerialEngine().run(
        [1, 2, 3], lambda t, k: t * k, lambda r: results.append(r),
        render_args=(10,),
    )
    assert results == [10, 20, 30]
    assert SerialEngine().worker_count() == 1
