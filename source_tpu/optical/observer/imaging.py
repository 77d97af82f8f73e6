"""Imaging observers (cameras).

TPU-native counterparts of raysect/optical/observer/imaging/{pinhole,
orthographic,ccd,vector,opencv,targeted_ccd}.pyx. Each camera supplies a
batched device ray generator; everything else (spectral slicing, tiling,
tracing, statistics) lives in Observer2D.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ...core.math import random as vrand
from .base import Observer2D
from .cameras import orthographic_rays, pinhole_geometry, pinhole_rays
from .pipelines import RGBPipeline2D

__all__ = [
    "PinholeCamera",
    "OrthographicCamera",
    "CCDArray",
    "VectorCamera",
]


class PinholeCamera(Observer2D):
    """Ideal pinhole camera (imaging/pinhole.pyx:42).

    fov is the angle across the horizontal field of view in degrees.
    """

    _rays_per_sample = 2

    def __init__(self, pixels=(512, 512), fov=45.0, sensitivity=1.0,
                 frame_sampler=None, pipelines=None, parent=None,
                 transform=None, name=None):
        pipelines = pipelines if pipelines is not None else [RGBPipeline2D()]
        super().__init__(
            pixels=pixels, frame_sampler=frame_sampler, pipelines=pipelines,
            parent=parent, transform=transform, name=name,
        )
        self._fov = None
        self._sensitivity = None
        self.fov = fov
        self.sensitivity = sensitivity

    @property
    def fov(self):
        return self._fov

    @fov.setter
    def fov(self, value):
        if value <= 0 or value >= 180:
            raise ValueError("The field-of-view angle must lie in the range (0, 180).")
        self._fov = float(value)

    @property
    def sensitivity(self):
        return self._sensitivity

    @sensitivity.setter
    def sensitivity(self, value):
        if value <= 0:
            raise ValueError("Sensitivity must be greater than zero.")
        self._sensitivity = float(value)

    def _pixel_sensitivity_array(self):
        return np.full(self.pixels[0] * self.pixels[1], self._sensitivity, np.float32)

    def _generate_rays_device(self, px, py, u):
        nx, ny = self.pixels
        return pinhole_rays(px, py, u[..., 0], u[..., 1], nx, ny, self._fov)


class OrthographicCamera(Observer2D):
    """Parallel projection camera (imaging/orthographic.pyx:41)."""

    _rays_per_sample = 2

    def __init__(self, pixels=(512, 512), width=1.0, sensitivity=1.0,
                 frame_sampler=None, pipelines=None, parent=None,
                 transform=None, name=None):
        pipelines = pipelines if pipelines is not None else [RGBPipeline2D()]
        super().__init__(
            pixels=pixels, frame_sampler=frame_sampler, pipelines=pipelines,
            parent=parent, transform=transform, name=name,
        )
        self._width = None
        self.width = width
        self.sensitivity = float(sensitivity)

    @property
    def width(self):
        return self._width

    @width.setter
    def width(self, value):
        if value <= 0:
            raise ValueError("Width must be greater than zero.")
        self._width = float(value)

    def _pixel_sensitivity_array(self):
        return np.full(self.pixels[0] * self.pixels[1], self.sensitivity, np.float32)

    def _generate_rays_device(self, px, py, u):
        nx, ny = self.pixels
        return orthographic_rays(px, py, u[..., 0], u[..., 1], nx, ny, self._width)


class CCDArray(Observer2D):
    """Physically-modelled CCD sensor array (imaging/ccd.pyx:42).

    Pixels observe a cosine-weighted hemisphere; the etendue-correct pixel
    sensitivity pi * A_pixel is applied so PowerPipelines read W.
    """

    _rays_per_sample = 4

    def __init__(self, pixels=(720, 480), width=0.035, frame_sampler=None,
                 pipelines=None, parent=None, transform=None, name=None):
        pipelines = pipelines if pipelines is not None else [RGBPipeline2D()]
        super().__init__(
            pixels=pixels, frame_sampler=frame_sampler, pipelines=pipelines,
            parent=parent, transform=transform, name=name,
        )
        self._width = None
        self.width = width

    @property
    def width(self):
        return self._width

    @width.setter
    def width(self, value):
        if value <= 0:
            raise ValueError("Width must be greater than zero.")
        self._width = float(value)
        self._update_geometry()

    def _update_geometry(self):
        nx, ny = self.pixels
        self._pixel_area = (self._width / nx) ** 2

    def _pixel_sensitivity_array(self):
        # etendue: pi * A (cosine-weighted hemisphere integral of cos)
        return np.full(
            self.pixels[0] * self.pixels[1],
            math.pi * self._pixel_area,
            np.float32,
        )

    def _generate_rays_device(self, px, py, u):
        nx, ny = self.pixels
        delta = self._width / nx
        sx = 0.5 * nx * delta
        sy = 0.5 * ny * delta
        dtype = jnp.float32
        ox = sx - delta * (px.astype(dtype) + 0.5) + (u[..., 0] - 0.5) * delta
        oy = sy - delta * (py.astype(dtype) + 0.5) + (u[..., 1] - 0.5) * delta
        origin = jnp.stack([ox, oy, jnp.zeros_like(ox)], axis=-1)
        direction = vrand.vector_hemisphere_cosine(u[..., 2], u[..., 3])
        weight = jnp.ones_like(ox)
        return origin, direction, weight


class VectorCamera(Observer2D):
    """Calibrated per-pixel ray camera (imaging/vector.pyx:44)."""

    _rays_per_sample = 2

    def __init__(self, pixel_origins, pixel_directions, frame_sampler=None,
                 pipelines=None, parent=None, transform=None, name=None):
        pixel_origins = np.asarray(pixel_origins, np.float32)
        pixel_directions = np.asarray(pixel_directions, np.float32)
        if pixel_origins.ndim == 2 and pixel_origins.dtype == object:
            raise ValueError("pixel_origins must be a numeric array [nx, ny, 3].")
        if pixel_origins.shape != pixel_directions.shape or pixel_origins.shape[-1] != 3:
            raise ValueError("Origin and direction arrays must both be [nx, ny, 3].")
        pixels = pixel_origins.shape[:2]
        pipelines = pipelines if pipelines is not None else [RGBPipeline2D()]
        super().__init__(
            pixels=pixels, frame_sampler=frame_sampler, pipelines=pipelines,
            parent=parent, transform=transform, name=name,
        )
        self.pixel_origins = jnp.asarray(pixel_origins)
        self.pixel_directions = jnp.asarray(pixel_directions)

    def _generate_rays_device(self, px, py, u):
        o = self.pixel_origins[px, py]
        d = self.pixel_directions[px, py]
        w = jnp.ones(px.shape, jnp.float32)
        return o, d, w
