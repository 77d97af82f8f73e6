"""Array interpolators: 1D/2D/3D gridded data -> smooth scalar fields.

TPU-native counterparts of the reference's array interpolators
(raysect/core/math/function/float/function1d/interpolate.pyx:45
``Interpolator1DArray``, function2d/interpolate/interpolator2darray.pyx:101,
function3d/interpolate/interpolator3darray.pyx:99): linear or cubic
interpolation with none/nearest/linear/quadratic extrapolation over an
``extrapolation_range``.

Design notes (vs the reference's per-cell polynomial solves):
  * cubic interpolation is local Hermite — knot slopes from second-order
    finite differences (the reference's _ArrayDerivative estimates,
    interpolate.pyx:627) — evaluated separably: every query gathers its
    (4,)^N neighbourhood and reduces one axis at a time, a fixed-size
    fused computation that vmaps and differentiates cleanly;
  * 'none' extrapolation cannot raise inside jit; out-of-range queries
    return NaN (the reference raises ValueError).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Function1D, Function2D, Function3D

__all__ = ["Interpolator1DArray", "Interpolator2DArray", "Interpolator3DArray"]

_INTERP_TYPES = ("linear", "cubic")
_EXTRAP_TYPES = ("none", "nearest", "linear", "quadratic")


def _check_axis(x, name):
    x = np.asarray(x, np.float64)
    if x.ndim != 1 or x.size < 2:
        raise ValueError(f"{name} must be a 1D array with >= 2 samples.")
    if not np.all(np.diff(x) > 0):
        raise ValueError(f"{name} must be strictly increasing.")
    return x


def _fd_slopes(x4, f4):
    """Finite-difference slopes over a gathered 4-point window (last axis).

    Interior knots get centred differences — identical across neighbouring
    windows, so the piecewise Hermite is C1. Clamped (duplicated) edge
    points degrade gracefully to one-sided differences.
    """
    dfd = jnp.gradient(f4, axis=-1)
    dxd = jnp.gradient(x4, axis=-1)
    ok = jnp.abs(dxd) > 1e-300
    return jnp.where(ok, dfd / jnp.where(ok, dxd, 1.0), 0.0)


def _hermite_window(x4, f4, q):
    """Cubic Hermite on the middle interval [x4[...,1], x4[...,2]] of a
    4-point window, with FD slopes. q broadcasts against x4[..., 0]."""
    m4 = _fd_slopes(x4, f4)
    h = x4[..., 2] - x4[..., 1]
    hs = jnp.maximum(jnp.abs(h), 1e-30) * jnp.where(h < 0, -1.0, 1.0)
    t = (q - x4[..., 1]) / hs
    f0, f1 = f4[..., 1], f4[..., 2]
    m0, m1 = m4[..., 1] * hs, m4[..., 2] * hs
    t2 = t * t
    t3 = t2 * t
    return (
        (2 * t3 - 3 * t2 + 1) * f0
        + (t3 - 2 * t2 + t) * m0
        + (-2 * t3 + 3 * t2) * f1
        + (t3 - t2) * m1
    )


class _GridInterpolator:
    """Shared N-D grid machinery (N = 1, 2, 3)."""

    def __init__(self, axes, f, interpolation_type, extrapolation_type,
                 extrapolation_range, names):
        interpolation_type = interpolation_type.lower()
        extrapolation_type = extrapolation_type.lower()
        if interpolation_type not in _INTERP_TYPES:
            raise ValueError(f"interpolation_type must be one of {_INTERP_TYPES}.")
        if extrapolation_type not in _EXTRAP_TYPES:
            raise ValueError(f"extrapolation_type must be one of {_EXTRAP_TYPES}.")
        self.interpolation_type = interpolation_type
        self.extrapolation_type = extrapolation_type
        self.extrapolation_range = float(extrapolation_range)

        axes = [_check_axis(a, nm) for a, nm in zip(axes, names)]
        f = np.asarray(f, np.float64)
        if f.shape != tuple(a.size for a in axes):
            raise ValueError("f shape must match the axis lengths.")
        if interpolation_type == "cubic" and any(a.size < 4 for a in axes):
            raise ValueError("cubic interpolation requires >= 4 samples per axis.")
        self._axes = [jnp.asarray(a) for a in axes]
        self._f = jnp.asarray(f)

    def _eval(self, *qs):
        qs = [jnp.asarray(q, self._f.dtype) for q in qs]
        nd = len(self._axes)
        rng = self.extrapolation_range
        clipped = []
        invalid = None
        for d in range(nd):
            x = self._axes[d]
            q = qs[d]
            if self.extrapolation_type == "none":
                inv = (q < x[0]) | (q > x[-1])
            else:
                inv = (q < x[0] - rng) | (q > x[-1] + rng)
            clipped.append(jnp.clip(q, x[0], x[-1]))
            invalid = inv if invalid is None else (invalid | inv)

        # base value at the clipped (nearest) coordinates
        if self.interpolation_type == "linear":
            val = self._multilinear(clipped)
        else:
            val = self._multicubic(clipped)

        # linear/quadratic extrapolation: per-axis Taylor correction from
        # the nearest edge (interpolate.pyx extrapolator semantics)
        if self.extrapolation_type in ("linear", "quadratic"):
            for d in range(nd):
                dq = qs[d] - clipped[d]
                outside = dq != 0.0
                g1 = self._edge_derivative(clipped, d, order=1)
                corr = g1 * dq
                if self.extrapolation_type == "quadratic":
                    g2 = self._edge_derivative(clipped, d, order=2)
                    corr = corr + 0.5 * g2 * dq * dq
                val = val + jnp.where(outside, corr, 0.0)
        return jnp.where(invalid, jnp.nan, val)

    def _edge_derivative(self, clipped, d, order):
        """Exact directional derivative (order 1 or 2) of the interpolant
        along axis d at the clipped edge point, via autodiff (no FD
        cancellation in f32)."""
        import jax

        interp = self._multilinear if self.interpolation_type == "linear" else self._multicubic
        nd = len(self._axes)

        def scalar_f(*qs_scalar):
            return interp([q[None] for q in qs_scalar])[0]

        g = jax.grad(scalar_f, argnums=d)
        if order == 2:
            g = jax.grad(g, argnums=d)
        shape = jnp.broadcast_shapes(*[jnp.shape(c) for c in clipped])
        flat = [jnp.broadcast_to(c, shape).reshape(-1) for c in clipped]
        out = jax.vmap(g)(*flat)
        return out.reshape(shape)

    def _cell_index(self, d, q):
        x = self._axes[d]
        return jnp.clip(jnp.searchsorted(x, q, side="right") - 1, 0, x.shape[0] - 2)

    def _multilinear(self, qs):
        nd = len(self._axes)
        idx, frac = [], []
        for d in range(nd):
            x = self._axes[d]
            i = self._cell_index(d, qs[d])
            # no clip on t: queries are pre-clipped to the axis range, and
            # clip's tie subgradient (1/2) would corrupt edge derivatives
            t = (qs[d] - x[i]) / jnp.maximum(x[i + 1] - x[i], 1e-30)
            idx.append(i)
            frac.append(t)
        val = 0.0
        for corner in range(2 ** nd):
            w = 1.0
            gather = []
            for d in range(nd):
                bit = (corner >> d) & 1
                w = w * (frac[d] if bit else (1.0 - frac[d]))
                gather.append(idx[d] + bit)
            val = val + w * self._f[tuple(gather)]
        return val

    def _multicubic(self, qs):
        nd = len(self._axes)
        offsets = jnp.arange(-1, 3)
        idx = [self._cell_index(d, qs[d]) for d in range(nd)]
        i4 = [
            jnp.clip(idx[d][..., None] + offsets, 0, self._axes[d].shape[0] - 1)
            for d in range(nd)
        ]
        # gather the (4,)^nd neighbourhood: block [..., 4_0, ..., 4_{nd-1}]
        gather_ix = []
        for d in range(nd):
            shape = i4[d].shape[:-1] + tuple(4 if k == d else 1 for k in range(nd))
            gather_ix.append(i4[d].reshape(shape))
        block = self._f[tuple(gather_ix)]

        # reduce axes from the last to the first with 1D Hermite windows
        for d in reversed(range(nd)):
            x4 = self._axes[d][i4[d]]  # [..., 4]
            # block's last axis is axis d's window; broadcast x4/q across the
            # remaining (earlier) window axes
            extra = block.ndim - 1 - (x4.ndim - 1)
            x4b = x4.reshape(x4.shape[:-1] + (1,) * extra + (4,))
            qb = qs[d].reshape(qs[d].shape + (1,) * extra)
            block = _hermite_window(jnp.broadcast_to(x4b, block.shape), block, qb)
        return block


class Interpolator1DArray(Function1D, _GridInterpolator):
    """1D gridded interpolator (interpolate.pyx:45 API)."""

    def __init__(self, x, f, interpolation_type="linear",
                 extrapolation_type="none", extrapolation_range=float("inf")):
        _GridInterpolator.__init__(self, [x], f, interpolation_type,
                                   extrapolation_type, extrapolation_range, ["x"])

    def __call__(self, x):
        return self._eval(x)


class Interpolator2DArray(Function2D, _GridInterpolator):
    """2D gridded interpolator (interpolator2darray.pyx:101 API)."""

    def __init__(self, x, y, f, interpolation_type="linear",
                 extrapolation_type="none", extrapolation_range_x=float("inf"),
                 extrapolation_range_y=float("inf")):
        _GridInterpolator.__init__(
            self, [x, y], f, interpolation_type, extrapolation_type,
            min(extrapolation_range_x, extrapolation_range_y), ["x", "y"],
        )

    def __call__(self, x, y):
        return self._eval(x, y)


class Interpolator3DArray(Function3D, _GridInterpolator):
    """3D gridded interpolator (interpolator3darray.pyx:99 API)."""

    def __init__(self, x, y, z, f, interpolation_type="linear",
                 extrapolation_type="none", extrapolation_range_x=float("inf"),
                 extrapolation_range_y=float("inf"),
                 extrapolation_range_z=float("inf")):
        _GridInterpolator.__init__(
            self, [x, y, z], f, interpolation_type, extrapolation_type,
            min(extrapolation_range_x, extrapolation_range_y, extrapolation_range_z),
            ["x", "y", "z"],
        )

    def __call__(self, x, y, z):
        return self._eval(x, y, z)
