"""Tests for the batched triangle/tetrahedra/polygon predicates and the
Function1D samplers (reference: cython/tests/test_triangle.py,
test_tetrahedra.py, test_utility.py patterns — exhaustive interior/exterior
point checks against closed forms)."""

import numpy as np

from source_tpu.core.math import (
    barycentric_coords, barycentric_coords_tetra, barycentric_interpolation,
    inside_tetrahedra, inside_triangle, point_inside_polygon, winding2d,
)
from source_tpu.core.math.function import sample1d, sample1d_points


def test_inside_triangle_batch():
    v1 = np.array([0.0, 0.0])
    v2 = np.array([1.0, 0.0])
    v3 = np.array([0.0, 1.0])
    pts = np.array([
        [0.25, 0.25],   # inside
        [0.9, 0.9],     # outside
        [0.0, 0.0],     # vertex (boundary inclusive)
        [0.5, 0.0],     # edge
        [-0.1, 0.5],    # outside
    ])
    got = np.asarray(inside_triangle(v1, v2, v3, pts))
    assert got.tolist() == [True, False, True, True, False]


def test_barycentric_coords_partition_of_unity():
    rng = np.random.default_rng(0)
    v1, v2, v3 = rng.normal(size=(3, 2))
    p = rng.normal(size=(50, 2))
    a, b, g = (np.asarray(x) for x in barycentric_coords(v1, v2, v3, p))
    np.testing.assert_allclose(a + b + g, 1.0, atol=1e-5)
    # reconstruction: sum of weighted vertices returns the query point
    rec = a[:, None] * v1 + b[:, None] * v2 + g[:, None] * v3
    np.testing.assert_allclose(rec, p, atol=1e-5)


def test_barycentric_interpolation_linear_field():
    # a linear field is reproduced exactly by barycentric interpolation
    v1 = np.array([0.0, 0.0])
    v2 = np.array([2.0, 0.0])
    v3 = np.array([0.0, 2.0])
    f = lambda p: 3.0 * p[..., 0] - 1.5 * p[..., 1] + 0.25
    p = np.array([[0.3, 0.4], [1.0, 0.5], [0.1, 1.2]])
    a, b, g = barycentric_coords(v1, v2, v3, p)
    got = np.asarray(barycentric_interpolation(a, b, g, f(v1), f(v2), f(v3)))
    np.testing.assert_allclose(got, f(p), atol=1e-5)


def test_inside_tetrahedra():
    v1 = np.array([0.0, 0.0, 0.0])
    v2 = np.array([1.0, 0.0, 0.0])
    v3 = np.array([0.0, 1.0, 0.0])
    v4 = np.array([0.0, 0.0, 1.0])
    pts = np.array([
        [0.1, 0.1, 0.1],    # inside
        [0.5, 0.5, 0.5],    # outside (beyond the diagonal face)
        [0.0, 0.0, 0.0],    # vertex
        [-0.01, 0.1, 0.1],  # outside
    ])
    got = np.asarray(inside_tetrahedra(v1, v2, v3, v4, pts))
    assert got.tolist() == [True, False, True, False]
    # centroid barycentrics are all 1/4
    cen = (v1 + v2 + v3 + v4) / 4.0
    coords = [float(c) for c in barycentric_coords_tetra(v1, v2, v3, v4, cen)]
    np.testing.assert_allclose(coords, 0.25, atol=1e-6)


def test_winding2d():
    ccw = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    assert not bool(np.asarray(winding2d(ccw)))
    assert bool(np.asarray(winding2d(ccw[::-1].copy())))


def test_point_inside_polygon_concave():
    # L-shaped polygon
    poly = np.array([
        [0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0], [1.0, 2.0], [0.0, 2.0]
    ])
    px = np.array([0.5, 1.5, 1.5, 0.5, 2.5])
    py = np.array([0.5, 0.5, 1.5, 1.5, 0.5])
    got = np.asarray(point_inside_polygon(poly, px, py))
    assert got.tolist() == [True, True, False, True, False]


def test_sample1d():
    x, f = sample1d(lambda x: x * x, 0.0, 2.0, 5)
    np.testing.assert_allclose(x, [0.0, 0.5, 1.0, 1.5, 2.0])
    np.testing.assert_allclose(f, x * x, atol=1e-6)
    got = sample1d_points(lambda x: 2.0 * x + 1.0, [0.0, 1.0, 3.0])
    np.testing.assert_allclose(got, [1.0, 3.0, 7.0], atol=1e-6)
    # validation mirrors samplers.pyx:56-61
    import pytest
    with pytest.raises(ValueError):
        sample1d(lambda x: x, 1.0, 0.0, 4)
    with pytest.raises(ValueError):
        sample1d(lambda x: x, 0.0, 1.0, 0)
