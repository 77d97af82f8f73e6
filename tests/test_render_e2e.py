"""End-to-end rendering tests (accuracy-demo pattern: scenes with known
answers, SURVEY.md §4)."""

import numpy as np
import pytest

from source_tpu.core import Point3D, translate, rotate
from source_tpu.core.scenegraph import Node, World
from source_tpu.primitive import Box, Sphere
from source_tpu.optical import ConstantSF, InterpolatedSF
from source_tpu.optical.material import (
    AbsorbingSurface,
    Lambert,
    UniformSurfaceEmitter,
    UnitySurfaceEmitter,
)
from source_tpu.optical.observer import (
    Observer0D,
    PinholeCamera,
    PowerPipeline2D,
    RadiancePipeline0D,
    RGBPipeline2D,
    RGBAdaptiveSampler2D,
    SpectralRadiancePipeline0D,
)


class _ObservingSphere(Observer0D):
    """0D observer launching rays isotropically (demos/accuracy pattern)."""

    _rays_per_sample = 2

    def _generate_rays_device(self, px, py, u):
        import jax.numpy as jnp

        from source_tpu.core.math import random as vrand

        d = vrand.vector_sphere(u[..., 0], u[..., 1])
        o = jnp.zeros_like(d)
        w = jnp.ones(d.shape[:-1], jnp.float32)
        return o, d, w


def test_observing_sphere_unity_emitter():
    """Observer inside a unity-emitting sphere must measure exactly
    1 W/m2/str/nm mean radiance (closed form)."""
    world = World()
    Sphere(5.0, parent=world, material=UnitySurfaceEmitter())
    radiance = RadiancePipeline0D()
    spectral = SpectralRadiancePipeline0D()
    obs = _ObservingSphere(parent=world, pipelines=[radiance, spectral])
    obs.pixel_samples = 256
    obs.spectral_bins = 8
    obs.quiet = True
    obs.observe(seed=42)
    # radiance pipeline integrates over the spectral range
    expected = obs.max_wavelength - obs.min_wavelength
    assert radiance.value.mean == pytest.approx(expected, rel=1e-5)
    np.testing.assert_allclose(spectral.frame.mean, 1.0, atol=1e-5)


def test_lambert_single_bounce_energy():
    """Absorbing box with emitting ceiling + lambert floor: radiance seen
    looking at the floor equals reflectivity x emitter radiance x view factor.
    With the whole upper hemisphere emitting, L_out = rho x L_in exactly."""
    world = World()
    # emitting sphere shell far away acts as uniform sky
    Sphere(100.0, parent=world, material=UniformSurfaceEmitter(ConstantSF(2.0)))
    # lambert floor at y=0 (rays from camera hit it, bounce up into sky)
    Box(Point3D(-50, -0.1, -50), Point3D(50, 0, 50), parent=world,
        material=Lambert(ConstantSF(0.5)), name="floor")

    rgb = PowerPipeline2D(name="power")
    cam = PinholeCamera((8, 8), fov=40, parent=world,
                        transform=translate(0, 3, 0) * rotate(0, -90, 0),
                        pipelines=[rgb])
    cam.pixel_samples = 512
    cam.spectral_bins = 4
    cam.ray_extinction_prob = 0.0
    cam.ray_max_depth = 8
    cam.ray_importance_sampling = False
    cam.quiet = True
    cam.observe(seed=7)
    # expected per-pixel power: rho x L x (lambda range) x weight(cos)
    # weights vary per pixel; check against 0.5 x 2.0 x 365 with cos factor
    # bounds: every pixel in (cos_min, 1] x expectation
    expected = 0.5 * 2.0 * (cam.max_wavelength - cam.min_wavelength)
    vals = rgb.frame.mean
    assert vals.min() > expected * 0.85
    assert vals.max() < expected * 1.05
    # statistical agreement in the center pixel (weight ~ 1)
    center = vals[4, 4]
    assert center == pytest.approx(expected, rel=0.05)


def test_cornell_box_render_smoke():
    """Small Cornell box render: wall colours land on the correct sides and
    the frame accumulates across passes."""
    import sys

    sys.path.insert(0, "demos")
    from cornell_box import build_world

    world = build_world(glass=False)
    rgb = RGBPipeline2D(name="rgb")
    cam = PinholeCamera((16, 16), parent=world,
                        transform=translate(0, 0, -3.3), pipelines=[rgb])
    cam.pixel_samples = 64
    cam.spectral_bins = 12
    cam.quiet = True
    cam.observe(seed=3)
    xyz = rgb.xyz_frame.mean
    assert np.isfinite(xyz).all()
    assert xyz.min() >= 0
    assert xyz.mean() > 0  # light got everywhere

    samples_first = rgb.xyz_frame.samples.copy()
    cam.observe(seed=4)
    assert (rgb.xyz_frame.samples == 2 * samples_first).all()

    img = rgb.rgb_image()
    # px=0 looks toward +x (red wall), px=-1 toward -x (green wall)
    left = img[0, 4:12].mean(axis=0)
    right = img[-1, 4:12].mean(axis=0)
    assert left[0] > left[1] * 1.5  # strongly red-dominant
    assert right[1] > right[0] * 0.8  # green component comparable or stronger


def test_adaptive_sampler_converges():
    """RGBAdaptiveSampler2D should produce fewer tasks once pixels meet the
    noise cutoff, and eventually report render_complete."""
    world = World()
    Sphere(10.0, parent=world, material=UniformSurfaceEmitter(ConstantSF(1.0)))
    rgb = RGBPipeline2D()
    sampler = RGBAdaptiveSampler2D(rgb, min_samples=32, cutoff=0.1, fraction=0.5)
    cam = PinholeCamera((8, 8), parent=world, pipelines=[rgb],
                        frame_sampler=sampler)
    cam.pixel_samples = 64
    cam.spectral_bins = 4
    cam.quiet = True
    for _ in range(4):
        cam.observe(seed=11)
        if cam.render_complete:
            break
    # uniform emitter sky: zero variance -> should complete quickly
    assert cam.render_complete


def test_diff_compaction_consistent():
    """Stream-compacted differentiable scan matches the plain scan's
    expectation (wavefront.trace_rays_diff compact_schedule)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from demos.cornell_box import build_world
    from source_tpu.compiler import SpectralConfig, compile_scene
    from source_tpu.parallel.engine import render_batch
    from source_tpu.tracer.wavefront import RayConfig

    scene = compile_scene(build_world(glass=False), SpectralConfig(375., 740., 6))
    n = 8192
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (n, 2))
    d = jnp.stack([(u[:, 0] - .5) * .8, (u[:, 1] - .5) * .8, jnp.ones(n)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray([0., 0., -3.3]), (n, 3))
    kw = dict(max_depth=12, extinction_prob=0.1, extinction_min_depth=3,
              importance_sampling=True, important_path_weight=0.25, max_iters=16)
    r_p = np.asarray(render_batch(
        scene, RayConfig(**kw), o, d, jax.random.PRNGKey(1), differentiable=True
    ).radiance)
    r_c = np.asarray(render_batch(
        scene, RayConfig(**kw, compact_schedule=((3, 4), (3, 4))), o, d,
        jax.random.PRNGKey(1), differentiable=True,
    ).radiance)
    assert abs(r_p.mean() - r_c.mean()) / r_p.mean() < 0.05
