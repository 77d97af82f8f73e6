"""Vector3D-valued function framework.

Counterpart of raysect/core/math/function/vector3d/ (FloatToVector3D
Function1D/2D/3D, constants, blend): scalar-argument fields returning
[..., 3] arrays instead of Vector3D objects. Composable with the float
framework: construct from three scalar Functions or wrap a callable.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import (
    autowrap_function1d, autowrap_function2d, autowrap_function3d,
)

__all__ = [
    "Vector3DFunction1D", "Vector3DFunction2D", "Vector3DFunction3D",
    "ConstantVector3D1D", "ConstantVector3D2D", "ConstantVector3D3D",
    "BlendVector3D1D", "BlendVector3D2D", "BlendVector3D3D",
    "FloatToVector3DFunction1D", "FloatToVector3DFunction2D",
    "FloatToVector3DFunction3D",
]


def _make(n, autowrap):
    class Vector3DFunction:
        """[...,3]-valued field of arity %d.""" % n

        _arity = n

        def __call__(self, *args):
            raise NotImplementedError

        def __add__(self, other):
            return _Lambda(lambda *a: self(*a) + _coerce(other)(*a))

        def __sub__(self, other):
            return _Lambda(lambda *a: self(*a) - _coerce(other)(*a))

        def __neg__(self):
            return _Lambda(lambda *a: -self(*a))

        def __mul__(self, scalar):
            s = autowrap(scalar)
            return _Lambda(lambda *a: self(*a) * s(*a)[..., None])

        __rmul__ = __mul__

        def __truediv__(self, scalar):
            s = autowrap(scalar)
            return _Lambda(lambda *a: self(*a) / s(*a)[..., None])

        def dot(self, other):
            """Scalar Function: dot product with another vector function."""
            o = _coerce(other)
            fn = lambda *a: jnp.sum(self(*a) * o(*a), axis=-1)
            from .base import PythonFunction1D, PythonFunction2D, PythonFunction3D

            cls = {1: PythonFunction1D, 2: PythonFunction2D, 3: PythonFunction3D}[n]
            return cls(fn)

        def cross(self, other):
            o = _coerce(other)
            return _Lambda(lambda *a: jnp.cross(self(*a), o(*a)))

    class _Lambda(Vector3DFunction):
        def __init__(self, fn):
            self._fn = fn

        def __call__(self, *args):
            return self._fn(*args)

    class FloatToVector3D(Vector3DFunction):
        """Build a vector field from three scalar Functions
        (vector3d FloatToVector3DFunctionXD)."""

        def __init__(self, x_function, y_function, z_function):
            self._fx = autowrap(x_function)
            self._fy = autowrap(y_function)
            self._fz = autowrap(z_function)

        def __call__(self, *args):
            return jnp.stack(
                [self._fx(*args), self._fy(*args), self._fz(*args)], axis=-1
            )

    class Constant(Vector3DFunction):
        def __init__(self, vector):
            if hasattr(vector, "x"):  # Vector3D/Point3D-like
                vector = (vector.x, vector.y, vector.z)
            self.value = jnp.asarray(list(vector), jnp.float32)
            if self.value.shape != (3,):
                raise ValueError("Constant vector must have 3 components.")

        def __call__(self, *args):
            if args:
                shape = jnp.shape(jnp.asarray(args[0])) + (3,)
                return jnp.broadcast_to(self.value, shape)
            return self.value

    class Blend(Vector3DFunction):
        """v1 + (v2 - v1) * clamp(mask, 0, 1)."""

        def __init__(self, f1, f2, mask):
            self._f1 = _coerce(f1)
            self._f2 = _coerce(f2)
            self._mask = autowrap(mask)

        def __call__(self, *args):
            a = self._f1(*args)
            b = self._f2(*args)
            m = jnp.clip(self._mask(*args), 0.0, 1.0)[..., None]
            return a + (b - a) * m

    def _coerce(obj):
        if isinstance(obj, Vector3DFunction):
            return obj
        if callable(obj):
            return _Lambda(obj)
        return Constant(obj)

    return Vector3DFunction, FloatToVector3D, Constant, Blend


(Vector3DFunction1D, FloatToVector3DFunction1D, ConstantVector3D1D,
 BlendVector3D1D) = _make(1, autowrap_function1d)
(Vector3DFunction2D, FloatToVector3DFunction2D, ConstantVector3D2D,
 BlendVector3D2D) = _make(2, autowrap_function2d)
(Vector3DFunction3D, FloatToVector3DFunction3D, ConstantVector3D3D,
 BlendVector3D3D) = _make(3, autowrap_function3d)
