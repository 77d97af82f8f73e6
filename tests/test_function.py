"""Function framework + interpolator tests (reference test idioms:
core/math/function/float/*/tests — operator algebra, golden-value interp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from source_tpu.core.math.function import (
    Arg1D, Arg2D, Blend1D, Constant1D, Constant2D, Exp1D, Sqrt2D,
    Atan4Q1D,
    Interpolator1DArray, Interpolator2DArray, Interpolator3DArray,
    Interpolator2DMesh, Discrete2DMesh, Discrete3DMesh,
    autowrap_function1d,
)


def test_function_algebra_1d():
    x = Arg1D("x")
    f = 2.0 * x + 1.0
    q = jnp.asarray([0.0, 1.0, 2.0])
    assert np.allclose(np.asarray(f(q)), [1.0, 3.0, 5.0])
    g = (x ** 2 - x) / (x + 3.0)
    assert np.allclose(np.asarray(g(jnp.asarray(2.0))), (4 - 2) / 5.0)
    h = abs(-x)
    assert np.allclose(np.asarray(h(q)), [0, 1, 2])
    m = x % 2.0
    assert np.allclose(np.asarray(m(jnp.asarray(3.0))), 1.0)
    c = x > 1.0  # comparison -> indicator function
    assert np.allclose(np.asarray(c(q)), [0.0, 0.0, 1.0])


def test_function_autowrap_and_python():
    f = autowrap_function1d(lambda x: x * 3.0)
    g = f + 1.0
    assert np.allclose(np.asarray(g(jnp.asarray(2.0))), 7.0)
    const = autowrap_function1d(4.0)
    assert np.allclose(np.asarray(const(jnp.asarray([1.0, 2.0]))), 4.0)


def test_function_math_wrappers():
    x = Arg1D("x")
    assert np.allclose(np.asarray(Exp1D(x)(jnp.asarray(1.0))), np.e, rtol=1e-6)
    y = Arg2D("y")
    assert np.allclose(np.asarray(Sqrt2D(y)(jnp.asarray(0.0), jnp.asarray(4.0))), 2.0)
    at = Atan4Q1D(x, Constant1D(1.0))
    assert np.allclose(np.asarray(at(jnp.asarray(1.0))), np.pi / 4, rtol=1e-6)


def test_blend():
    b = Blend1D(0.0, 10.0, Arg1D("x"))
    q = jnp.asarray([-1.0, 0.25, 2.0])
    assert np.allclose(np.asarray(b(q)), [0.0, 2.5, 10.0])


def test_interp1d_linear_matches_numpy():
    x = np.linspace(0, 10, 11)
    f = np.sin(x)
    interp = Interpolator1DArray(x, f, "linear", "nearest", 10.0)
    q = np.linspace(-1, 11, 101)
    got = np.asarray(interp(jnp.asarray(q)))
    want = np.interp(q, x, f)
    assert np.allclose(got, want, atol=1e-6)


def test_interp1d_cubic_accuracy():
    x = np.linspace(0, 2 * np.pi, 25)
    f = np.sin(x)
    interp = Interpolator1DArray(x, f, "cubic", "none")
    q = np.linspace(0.01, 2 * np.pi - 0.01, 200)
    got = np.asarray(interp(jnp.asarray(q)))
    assert np.allclose(got, np.sin(q), atol=1e-3)  # O(h^3) FD-Hermite, f32
    # knots are reproduced exactly
    assert np.allclose(np.asarray(interp(jnp.asarray(x[1:-1]))), f[1:-1], atol=1e-7)


def test_interp1d_extrapolation_modes():
    x = np.linspace(0, 1, 5)
    f = 2.0 * x + 1.0
    # none -> NaN outside
    none = Interpolator1DArray(x, f, "linear", "none")
    assert np.isnan(np.asarray(none(jnp.asarray(2.0))))
    # nearest
    near = Interpolator1DArray(x, f, "linear", "nearest", 10.0)
    assert np.allclose(np.asarray(near(jnp.asarray(2.0))), 3.0)
    # linear continues the line exactly
    lin = Interpolator1DArray(x, f, "linear", "linear", 10.0)
    assert np.allclose(np.asarray(lin(jnp.asarray(2.0))), 5.0, atol=1e-4)
    # beyond extrapolation_range -> NaN
    rng = Interpolator1DArray(x, f, "linear", "nearest", 0.5)
    assert np.isnan(np.asarray(rng(jnp.asarray(2.0))))


def test_interp2d_linear_and_cubic():
    x = np.linspace(0, 1, 9)
    y = np.linspace(0, 2, 11)
    xx, yy = np.meshgrid(x, y, indexing="ij")
    f = xx ** 2 + yy
    lin = Interpolator2DArray(x, y, f, "linear", "none")
    cub = Interpolator2DArray(x, y, f, "cubic", "none")
    qx = jnp.asarray([0.35, 0.5, 0.77])
    qy = jnp.asarray([0.3, 1.0, 1.9])
    want = np.asarray(qx) ** 2 + np.asarray(qy)
    assert np.allclose(np.asarray(lin(qx, qy)), want, atol=5e-3)
    assert np.allclose(np.asarray(cub(qx, qy)), want, atol=1e-5)


def test_interp3d_linear_and_cubic():
    x = np.linspace(0, 1, 6)
    y = np.linspace(0, 1, 7)
    z = np.linspace(0, 1, 8)
    xx, yy, zz = np.meshgrid(x, y, z, indexing="ij")
    f = xx + 2 * yy + 3 * zz
    lin = Interpolator3DArray(x, y, z, f, "linear", "none")
    cub = Interpolator3DArray(x, y, z, f, "cubic", "none")
    q = (jnp.asarray([0.3, 0.71]), jnp.asarray([0.45, 0.2]), jnp.asarray([0.6, 0.9]))
    want = np.asarray(q[0]) + 2 * np.asarray(q[1]) + 3 * np.asarray(q[2])
    assert np.allclose(np.asarray(lin(*q)), want, atol=1e-6)  # trilinear exact on linear f
    assert np.allclose(np.asarray(cub(*q)), want, atol=1e-5)


def test_interpolator2dmesh():
    # unit square split into two triangles, f = x + y (linear -> exact)
    v = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    t = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    data = v[:, 0] + v[:, 1]
    interp = Interpolator2DMesh(v, data, t, limit=False, default_value=-1.0)
    qx = jnp.asarray([0.25, 0.75, 0.5, 2.0])
    qy = jnp.asarray([0.25, 0.5, 0.99, 2.0])
    got = np.asarray(interp(qx, qy))
    assert np.allclose(got[:3], [0.5, 1.25, 1.49], atol=1e-6)
    assert got[3] == -1.0  # outside -> default


def test_discrete2dmesh():
    v = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    t = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    d = Discrete2DMesh(v, t, [5.0, 7.0], limit=False, default_value=0.0)
    got = np.asarray(d(jnp.asarray([0.7, 0.3, 5.0]), jnp.asarray([0.2, 0.7, 5.0])))
    assert got[0] == 5.0 and got[1] == 7.0 and got[2] == 0.0


def test_discrete3dmesh():
    # unit cube split into 5 tets? use a single tet for simplicity
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    t = np.array([[0, 1, 2, 3]], np.int32)
    d = Discrete3DMesh(v, t, [9.0], limit=False, default_value=-2.0)
    got = np.asarray(d(jnp.asarray([0.1, 0.9]), jnp.asarray([0.1, 0.9]), jnp.asarray([0.1, 0.9])))
    assert got[0] == 9.0 and got[1] == -2.0
