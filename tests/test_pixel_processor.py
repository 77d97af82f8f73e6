"""Custom pipelines written against the reference PixelProcessor API
(base/processor.pyx:61-72, base/pipeline.pyx:37-254).

A pipeline that defines ``pixel_processor(pixel_id, slice_id)`` instead of
the device-side ``project`` is driven on the host: the observer hands every
traced sample spectrum to ``add_sample`` and folds ``pack_results`` through
``pipeline.update`` — the reference worker loop (base/observer.pyx:363-419).
"""

import numpy as np

from source_tpu.core.scenegraph import World
from source_tpu.optical.material import UnitySurfaceEmitter
from source_tpu.optical.observer import (
    Pipeline0D, Pipeline2D, PixelProcessor, Pixel, PinholeCamera,
    PowerPipeline0D,
)
from source_tpu.primitive import Sphere

DLAM = 740.0 - 375.0


class _PowerProcessor(PixelProcessor):
    """Reference-style processor: accumulate integrated power per sample."""

    def __init__(self):
        self.values = []

    def add_sample(self, spectrum, sensitivity):
        self.values.append(spectrum.integrate() * sensitivity)

    def pack_results(self):
        v = np.asarray(self.values)
        return float(v.mean()), int(v.size)


class CustomPowerPipeline0D(Pipeline0D):
    """User pipeline using ONLY the reference processor contract."""

    name = "CustomPower0D"

    def initialise(self, shape, spectral_config, slices, quiet=False):
        self.totals = {}

    def pixel_processor(self, pixel_id, slice_id):
        return _PowerProcessor()

    def update(self, pixel_id, packed, slice_id):
        mean, n = packed
        prev_mean, prev_n = self.totals.get(pixel_id, (0.0, 0))
        self.totals[pixel_id] = (prev_mean + mean, prev_n + n)

    def finalise(self):
        self.value = sum(m for m, _ in self.totals.values())


class CustomMax2D(Pipeline2D):
    """2D processor pipeline recording per-pixel max sample power."""

    name = "CustomMax2D"

    def initialise(self, shape, spectral_config, slices, quiet=False):
        self.frame = np.zeros(shape)

    def pixel_processor(self, pixel_id, slice_id):
        return _PowerProcessor()

    def update(self, pixel_id, packed, slice_id):
        iy = pixel_id % self.frame.shape[1]
        ix = pixel_id // self.frame.shape[1]
        self.frame[ix, iy] += packed[0]

    def finalise(self):
        pass


def _furnace(observer):
    w = World()
    Sphere(radius=10.0, parent=w, material=UnitySurfaceEmitter())
    observer.parent = w
    observer.quiet = True
    return w


def test_custom_processor_pipeline_matches_builtin():
    """Custom processor pipeline agrees with the device PowerPipeline0D
    on the same observation (same rays: both pipelines ride one kernel)."""
    builtin = PowerPipeline0D(accumulate=False)
    custom = CustomPowerPipeline0D()
    pix = Pixel(x_width=0.01, y_width=0.01, pipelines=[builtin, custom])
    _furnace(pix)
    pix.pixel_samples = 64
    pix.ray_extinction_prob = 0.0
    pix.observe(seed=3)

    expected = 1e-4 * np.pi * DLAM  # A * pi * d_lambda closed form
    assert abs(custom.value - expected) / expected < 5e-3
    # same traced samples -> same mean power to float tolerance
    assert abs(custom.value - builtin.value.mean) / expected < 1e-5


def test_custom_processor_pipeline_2d():
    pipe = CustomMax2D()
    cam = PinholeCamera(pixels=(4, 4), pipelines=[pipe])
    _furnace(cam)
    cam.pixel_samples = 8
    cam.ray_extinction_prob = 0.0
    cam.observe(seed=5)
    # every pixel sees the unity furnace: uniform positive frame
    assert np.all(pipe.frame > 0.0)


def test_processor_pipeline_spectral_slices():
    """Processor pipelines receive one processor per spectral slice and
    the slice spectra partition the range (base/observer.pyx:311-340)."""
    custom = CustomPowerPipeline0D()
    pix = Pixel(x_width=0.01, y_width=0.01, pipelines=[custom])
    _furnace(pix)
    pix.pixel_samples = 32
    pix.spectral_rays = 3  # three slices, processors fold per slice
    pix.ray_extinction_prob = 0.0
    pix.observe(seed=7)
    expected = 1e-4 * np.pi * DLAM
    assert abs(custom.value - expected) / expected < 5e-3
