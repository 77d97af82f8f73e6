"""Observer sample chunking (base/observer.pyx:629-644 samples_per_task).

A large pixel_samples observation must stream in fixed-memory sample
chunks rather than one [tasks, samples] device batch, with identical
statistics semantics (VERDICT round-1 item 8)."""

import numpy as np

from source_tpu.core.scenegraph import World
from source_tpu.optical.material import UnitySurfaceEmitter
from source_tpu.optical.observer import (
    FibreOptic,
    PowerPipeline0D,
    SpectralRadiancePipeline0D,
)
from source_tpu.primitive import Sphere


def _observe(pixel_samples, samples_per_task):
    w = World()
    Sphere(radius=10.0, parent=w, material=UnitySurfaceEmitter())
    power = PowerPipeline0D()
    spec = SpectralRadiancePipeline0D()
    fibre = FibreOptic(acceptance_angle=10.0, radius=0.001, parent=w,
                       pipelines=[power, spec])
    fibre.pixel_samples = pixel_samples
    fibre.samples_per_task = samples_per_task
    fibre.spectral_bins = 4
    fibre.quiet = True
    fibre.observe(seed=11)
    return power, spec


def test_chunked_matches_unity_radiator():
    # furnace condition: every ray sees radiance exactly 1.0; the fibre's
    # uniform-cone samples carry a cos(theta) weight so the weighted mean is
    # E[cos] over the cone = (1 + cos_max) / 2
    power, spec = _observe(pixel_samples=1000, samples_per_task=128)
    assert power.value.samples == 1000
    expected = 0.5 * (1.0 + np.cos(np.radians(10.0)))
    np.testing.assert_allclose(spec.frame.mean, expected, rtol=2e-3)
    assert power.value.mean > 0.0


def test_chunked_equals_unchunked_statistics():
    p1, s1 = _observe(pixel_samples=600, samples_per_task=600)
    p2, s2 = _observe(pixel_samples=600, samples_per_task=100)
    # different RNG partitioning: agreement is statistical, counts exact
    assert p1.value.samples == p2.value.samples == 600
    np.testing.assert_allclose(p1.value.mean, p2.value.mean, rtol=2e-3)
    np.testing.assert_allclose(s1.frame.mean, s2.frame.mean, rtol=2e-3)
