"""Observer framework: adaptive samplers, spectral slicing, accumulation."""

import numpy as np

from source_tpu.core.scenegraph import World
from source_tpu.optical.material import UnitySurfaceEmitter
from source_tpu.optical.observer import (
    MonoAdaptiveSampler2D, OrthographicCamera, PowerPipeline2D,
    SpectralRadiancePipeline0D, SightLine,
)
from source_tpu.primitive import Sphere


def _furnace_cam(pipe, sampler=None):
    w = World()
    Sphere(radius=10.0, parent=w, material=UnitySurfaceEmitter())
    cam = OrthographicCamera(pixels=(8, 8), width=1.0, pipelines=[pipe],
                             frame_sampler=sampler, parent=w)
    cam.pixel_samples = 16
    cam.ray_extinction_prob = 0.0
    cam.quiet = True
    return cam


def test_adaptive_sampler_converges_to_no_tasks():
    """In a zero-variance furnace the adaptive sampler must stop issuing
    tasks after min_samples are met -> render_complete (the reference's
    checkpointed accumulation loop, demos/cornell_box.py:163-174)."""
    pipe = PowerPipeline2D(accumulate=True)
    sampler = MonoAdaptiveSampler2D(pipe, fraction=0.2, ratio=10.0,
                                    min_samples=32, cutoff=0.01)
    cam = _furnace_cam(pipe, sampler)
    passes = 0
    while not cam.render_complete and passes < 10:
        cam.observe(seed=passes)
        passes += 1
    assert cam.render_complete
    # every pixel reached at least min_samples with zero noise
    assert pipe.frame.samples.min() >= 32
    assert np.allclose(pipe.frame.variance, 0.0, atol=1e-12)


def test_spectral_rays_slicing_consistent():
    """spectral_rays > 1 splits the range into independently traced slices
    whose zero-filled projections sum to the full spectrum."""
    p1 = SpectralRadiancePipeline0D(accumulate=False)
    s1 = SightLine(pipelines=[p1])
    w = World()
    Sphere(radius=10.0, parent=w, material=UnitySurfaceEmitter())
    s1.parent = w
    s1.quiet = True
    s1.pixel_samples = 8
    s1.ray_extinction_prob = 0.0
    s1.spectral_bins = 12
    s1.spectral_rays = 3
    s1.observe(seed=1)
    assert p1.frame.mean.shape == (12,)
    assert np.allclose(p1.frame.mean, 1.0, atol=1e-5)


def test_accumulation_reduces_error():
    pipe = PowerPipeline2D(accumulate=True)
    w = World()
    Sphere(radius=10.0, parent=w, material=UnitySurfaceEmitter())
    cam = OrthographicCamera(pixels=(4, 4), width=1.0, pipelines=[pipe], parent=w)
    cam.pixel_samples = 8
    cam.ray_extinction_prob = 0.1  # adds variance via roulette
    cam.quiet = True
    cam.observe(seed=1)
    n1 = pipe.frame.samples.copy()
    cam.observe(seed=2)
    assert (pipe.frame.samples == 2 * n1).all()
