"""User-extensible BSDF tests (reference material.pyx:205-390 extension
point: DiscreteBSDF / ContinuousBSDF subclasses).

A user-authored cosine-lobe Lambert written against the ContinuousBSDF
contract must reproduce the built-in Lambert estimator exactly (same
uniform slots, same one-sample MIS weighting), and a user-authored mirror
against the DiscreteBSDF contract must reproduce PerfectReflectingSurface.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from source_tpu.core import Point3D, translate
from source_tpu.core.scenegraph import World
from source_tpu.optical import ConstantSF
from source_tpu.optical.material import (
    ContinuousBSDF,
    DiscreteBSDF,
    Lambert,
    PerfectReflectingSurface,
    UniformSurfaceEmitter,
)
from source_tpu.optical.material.base import NSLOTS
from source_tpu.primitive import Box, Sphere
from source_tpu.optical.observer import PinholeCamera, PowerPipeline2D


class _UserLambert(ContinuousBSDF):
    """Cosine-hemisphere Lambert via the user extension API."""

    def __init__(self, reflectivity=0.5):
        super().__init__()
        self._reflectivity = ConstantSF(reflectivity)

    def compile_spectra(self, min_wavelength, max_wavelength, bins):
        out = np.zeros((NSLOTS, bins))
        out[0] = self._reflectivity.sample(min_wavelength, max_wavelength, bins)
        return out

    def sample(self, w_in, u1, u2, spectra, params, back_face):
        from source_tpu.core.math import random as vrand

        return vrand.vector_hemisphere_cosine(u1, u2)

    def pdf(self, w_in, w_out, spectra, params, back_face):
        return jnp.maximum(w_out[:, 2], 0.0) / jnp.pi

    def bsdf(self, w_in, w_out, wavelengths, spectra, params, back_face):
        # reflective-only: zero below the hemisphere (the reference Lambert
        # returns an empty spectrum for s_outgoing.z <= 0, lambert.pyx:85)
        up = (w_out[:, 2] > 0.0)[:, None]
        return jnp.where(up, spectra[:, 0, :] / jnp.pi, 0.0)


class _UserMirror(DiscreteBSDF):
    """Lossless mirror via the user extension API."""

    def evaluate_shading(self, w_in, u, wavelengths, spectra, params, back_face):
        w_out = jnp.stack([-w_in[:, 0], -w_in[:, 1], w_in[:, 2]], axis=-1)
        weight = jnp.ones((w_in.shape[0], wavelengths.shape[0]), w_in.dtype)
        transmitted = jnp.zeros(w_in.shape[0], dtype=bool)
        return w_out, weight, transmitted


def _render_power(material, seed=7):
    world = World()
    # emitting ceiling, diffuse/mirror floor, camera looking at the floor
    Box(Point3D(-2, 1.0, -2), Point3D(2, 1.2, 2), parent=world,
        material=UniformSurfaceEmitter(ConstantSF(2.0)))
    Box(Point3D(-2, -1.2, -2), Point3D(2, -1.0, 2), parent=world,
        material=material)
    power = PowerPipeline2D()
    cam = PinholeCamera((8, 8), parent=world, pipelines=[power],
                        transform=translate(0, 0, -2.5))
    cam.pixel_samples = 64
    cam.spectral_bins = 4
    cam.ray_max_depth = 6
    cam.ray_extinction_prob = 0.05
    cam.quiet = True
    cam.observe(seed=seed)
    return power.frame.mean.copy()


def test_user_lambert_matches_builtin():
    ours = _render_power(_UserLambert(0.5))
    builtin = _render_power(Lambert(ConstantSF(0.5)))
    # identical estimator + identical uniform slots -> near-bitwise match
    np.testing.assert_allclose(ours, builtin, rtol=1e-5, atol=1e-7)
    assert ours.max() > 0.0


def test_user_mirror_matches_perfect_reflector():
    ours = _render_power(_UserMirror())
    builtin = _render_power(PerfectReflectingSurface())
    np.testing.assert_allclose(ours, builtin, rtol=1e-5, atol=1e-7)
    assert ours.max() > 0.0


def test_continuous_bsdf_abstract_raises():
    mat = ContinuousBSDF()
    with pytest.raises(NotImplementedError):
        mat.sample(None, None, None, None, None, None)
    with pytest.raises(NotImplementedError):
        DiscreteBSDF().evaluate_shading(None, None, None, None, None, None)


class _TransmissiveLambert(ContinuousBSDF):
    """Transmits through the surface with a cosine lobe on the FAR side —
    exercises the below-hemisphere ContinuousBSDF path (the reference hands
    w_transmission_origin to evaluate_shading, material.pyx:286-361)."""

    def __init__(self, transmissivity=1.0):
        super().__init__()
        self._sf = ConstantSF(transmissivity)

    def compile_spectra(self, min_wavelength, max_wavelength, bins):
        out = np.zeros((NSLOTS, bins))
        out[0] = self._sf.sample(min_wavelength, max_wavelength, bins)
        return out

    def sample(self, w_in, u1, u2, spectra, params, back_face):
        from source_tpu.core.math import random as vrand

        w = vrand.vector_hemisphere_cosine(u1, u2)
        return w * jnp.asarray([1.0, 1.0, -1.0])  # flip below the surface

    def pdf(self, w_in, w_out, spectra, params, back_face):
        return jnp.maximum(-w_out[:, 2], 0.0) / jnp.pi

    def bsdf(self, w_in, w_out, wavelengths, spectra, params, back_face):
        return spectra[:, 0, :] / jnp.pi


def test_transmissive_continuous_bsdf_not_black():
    """A transmissive ContinuousBSDF must pass light through, not render
    black (round-1 advisor finding: lanes with cos_out <= 0 were killed)."""
    world = World()
    # emitter BEHIND the screen; camera sees it only through transmission
    Box(Point3D(-2, -2, 1.0), Point3D(2, 2, 1.2), parent=world,
        material=UniformSurfaceEmitter(ConstantSF(3.0)))
    Box(Point3D(-2, -2, 0.2), Point3D(2, 2, 0.4), parent=world,
        material=_TransmissiveLambert(1.0))
    power = PowerPipeline2D()
    cam = PinholeCamera((6, 6), parent=world, pipelines=[power],
                        transform=translate(0, 0, -1.5))
    cam.pixel_samples = 128
    cam.spectral_bins = 2
    cam.ray_max_depth = 6
    cam.quiet = True
    cam.observe(seed=3)
    assert power.frame.mean.max() > 0.0
