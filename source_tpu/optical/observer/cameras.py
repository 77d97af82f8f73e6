"""Camera ray-generation kernels.

Device-side counterparts of the reference imaging observers'
``_generate_rays`` methods (optical/observer/imaging/*.pyx). Each generator
maps (pixel ids, uniforms) -> (origin, direction, weight) in *camera local
space*; the observer transforms them to world space with its scenegraph
transform. All are batched jnp functions.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ...core.math import batch as vmath

__all__ = [
    "pinhole_geometry",
    "pinhole_rays",
    "orthographic_rays",
    "ccd_rays",
    "vector_camera_rays",
]


def pinhole_geometry(nx, ny, fov):
    """Image-plane geometry (pinhole.pyx:148-166)."""
    max_pixels = max(nx, ny)
    if max_pixels <= 1:
        raise RuntimeError("Number of Pinhole camera pixels must be > 1.")
    image_max_width = 2.0 * math.tan(math.pi / 180.0 * 0.5 * fov)
    image_delta = image_max_width / max_pixels
    image_start_x = 0.5 * nx * image_delta
    image_start_y = 0.5 * ny * image_delta
    return image_delta, image_start_x, image_start_y


def pinhole_rays(px, py, u1, u2, nx, ny, fov, dtype=jnp.float32):
    """Pinhole rays for pixel indices px/py [N] with jitter uniforms u1/u2.

    Matches PinholeCamera._generate_rays (pinhole.pyx:168-200): origin at the
    aperture, direction through a jittered point on the virtual image plane
    at z=1; radiometric weight = direction.z (projected-area cosine).
    """
    delta, sx, sy = pinhole_geometry(nx, ny, fov)
    cx = sx - delta * (px.astype(dtype) + 0.5)
    cy = sy - delta * (py.astype(dtype) + 0.5)
    x = cx + (u1 - 0.5) * delta
    y = cy + (u2 - 0.5) * delta
    direction = vmath.normalise(
        jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    )
    origin = jnp.zeros_like(direction)
    weight = direction[..., 2]
    return origin, direction, weight


def orthographic_rays(px, py, u1, u2, nx, ny, width, dtype=jnp.float32):
    """Parallel-projection rays (orthographic.pyx:41): origins on the sensor
    plane, direction +z, unit weight."""
    delta = width / max(nx, ny)
    sx = 0.5 * nx * delta
    sy = 0.5 * ny * delta
    ox = sx - delta * (px.astype(dtype) + 0.5) + (u1 - 0.5) * delta
    oy = sy - delta * (py.astype(dtype) + 0.5) + (u2 - 0.5) * delta
    ox, oy = jnp.broadcast_arrays(ox, oy)
    origin = jnp.stack([ox, oy, jnp.zeros_like(ox)], axis=-1)
    direction = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype), origin.shape
    )
    weight = jnp.ones_like(ox)
    return origin, direction, weight


def ccd_rays(px, py, u, nx, ny, width, dtype=jnp.float32):
    """Physical CCD rays (ccd.pyx:42-110): jittered origin on the sensor,
    cosine-weighted hemisphere directions; etendue-correct sensitivity is
    applied by the observer (pi * pixel_area normalisation folded into the
    pipeline sensitivity). ``u`` is [N, 4] uniforms."""
    from ...core.math import random as vrand

    delta = width / nx
    sx = 0.5 * nx * delta
    sy = 0.5 * ny * delta
    ox = sx - delta * (px.astype(dtype) + 0.5) + (u[..., 0] - 0.5) * delta
    oy = sy - delta * (py.astype(dtype) + 0.5) + (u[..., 1] - 0.5) * delta
    origin = jnp.stack([ox, oy, jnp.zeros_like(ox)], axis=-1)
    direction = vrand.vector_hemisphere_cosine(u[..., 2], u[..., 3])
    weight = jnp.ones_like(ox)
    return origin, direction, weight


def vector_camera_rays(px, py, origins, directions, dtype=jnp.float32):
    """Calibrated per-pixel rays (vector.pyx:44-75): gather the supplied
    origin/direction tables at the pixel indices."""
    idx = (px, py)
    origin = origins[idx]
    direction = directions[idx]
    weight = jnp.ones(px.shape, dtype)
    return origin, direction, weight
