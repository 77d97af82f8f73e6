"""Non-imaging observers: analytic accuracy checks (reference
demos/accuracy pattern — closed-form scenes, e.g. observing_sphere.py)."""

import numpy as np

import jax.numpy as jnp

from source_tpu.core.scenegraph import World
from source_tpu.optical.material import UnitySurfaceEmitter
from source_tpu.optical.observer import (
    FibreOptic, MeshCamera, MeshPixel, OpenCVCamera, Pixel,
    PowerPipeline0D, PowerPipeline1D, RadiancePipeline0D, SightLine,
    TargetedCCDArray, TargetedPixel, PowerPipeline2D,
)
from source_tpu.primitive import Sphere

DLAM = 740.0 - 375.0  # spectral range integrates to this for unity emitters


def _furnace(observer):
    w = World()
    Sphere(radius=10.0, parent=w, material=UnitySurfaceEmitter())
    observer.parent = w
    observer.quiet = True
    return w


def test_pixel_power_closed_form():
    pipe = PowerPipeline0D(accumulate=False)
    pix = Pixel(x_width=0.01, y_width=0.01, pipelines=[pipe])
    _furnace(pix)
    pix.pixel_samples = 200
    pix.ray_extinction_prob = 0.0
    pix.observe(seed=1)
    expected = 1e-4 * np.pi * DLAM  # A * pi * d_lambda
    got = pipe.value.mean
    assert abs(got - expected) / expected < 1e-3, (got, expected)


def test_sightline_radiance():
    pipe = RadiancePipeline0D(accumulate=False)
    sl = SightLine(pipelines=[pipe])
    _furnace(sl)
    sl.pixel_samples = 16
    sl.ray_extinction_prob = 0.0
    sl.observe(seed=1)
    # unity radiance integrated over the spectral range
    assert abs(pipe.value.mean - DLAM) / DLAM < 1e-5


def test_fibreoptic_power_closed_form():
    pipe = PowerPipeline0D(accumulate=False)
    fo = FibreOptic(acceptance_angle=10.0, radius=0.001, pipelines=[pipe])
    _furnace(fo)
    fo.pixel_samples = 1000
    fo.ray_extinction_prob = 0.0
    fo.observe(seed=2)
    area = np.pi * 0.001 ** 2
    expected = area * np.pi * np.sin(np.deg2rad(10.0)) ** 2 * DLAM
    got = pipe.value.mean
    assert abs(got - expected) / expected < 5e-3, (got, expected)


def test_targeted_pixel_unbiased_in_furnace():
    w = World()
    Sphere(radius=10.0, parent=w, material=UnitySurfaceEmitter())
    target = Sphere(radius=0.5, parent=w, material=UnitySurfaceEmitter())
    target.transform = __import__(
        "source_tpu.core.math.transform", fromlist=["translate"]
    ).translate(0.0, 0.0, 3.0)
    pipe = PowerPipeline0D(accumulate=False)
    # p=0.5: in a furnace the targeted cone is no better than ambient, and
    # a high targeted fraction inflates the 1/pdf variance of the ambient
    # complement — 0.5 keeps the unbiasedness check statistically tight
    tp = TargetedPixel(target, x_width=0.01, y_width=0.01,
                       targeted_path_prob=0.5, pipelines=[pipe])
    tp.parent = w
    tp.quiet = True
    tp.pixel_samples = 8000
    tp.ray_extinction_prob = 0.0
    tp.observe(seed=3)
    expected = 1e-4 * np.pi * DLAM
    got = pipe.value.mean
    assert abs(got - expected) / expected < 0.05, (got, expected)


def _cube_mesh_data():
    from source_tpu.primitive import MeshData

    v = np.array(
        [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32) * 0.05
    t = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
         [2, 3, 7], [2, 7, 6], [0, 4, 7], [0, 7, 3], [1, 2, 6], [1, 6, 5]],
        np.int32)
    return MeshData(v, t, smoothing=False, closed=True)


def test_mesh_pixel_power():
    data = _cube_mesh_data()
    pipe = PowerPipeline0D(accumulate=False)
    mp = MeshPixel(data, pipelines=[pipe])
    _furnace(mp)
    mp.pixel_samples = 1000
    mp.ray_extinction_prob = 0.0
    mp.observe(seed=4)
    total_area = 6 * (0.1) ** 2
    expected = total_area * np.pi * DLAM
    got = pipe.value.mean
    assert abs(got - expected) / expected < 5e-3, (got, expected)


def test_mesh_camera_per_triangle():
    data = _cube_mesh_data()
    pipe = PowerPipeline1D(accumulate=False)
    mc = MeshCamera(data, pipelines=[pipe])
    _furnace(mc)
    mc.pixel_samples = 100
    mc.ray_extinction_prob = 0.0
    mc.observe(seed=5)
    tri_area = 0.5 * (0.1) ** 2
    expected = tri_area * np.pi * DLAM
    means = pipe.frame.mean
    assert means.shape == (12,)
    assert np.allclose(means, expected, rtol=1e-3), (means, expected)


def test_opencv_camera_renders():
    pipe = PowerPipeline2D(accumulate=False)
    cm = [[100.0, 0.0, 8.0], [0.0, 100.0, 8.0], [0.0, 0.0, 1.0]]
    cam = OpenCVCamera(cm, [0.05, 0.01, 0.0, 0.0, 0.0], pixels=(16, 16),
                       pipelines=[pipe])
    _furnace(cam)
    cam.pixel_samples = 8
    cam.ray_extinction_prob = 0.0
    cam.observe(seed=6)
    assert np.isfinite(pipe.frame.mean).all()
    assert (pipe.frame.mean > 0).all()


def test_targeted_ccd_renders():
    w = World()
    Sphere(radius=10.0, parent=w, material=UnitySurfaceEmitter())
    target = Sphere(radius=0.5, parent=w, material=UnitySurfaceEmitter())
    pipe = PowerPipeline2D(accumulate=False)
    cam = TargetedCCDArray([target], pixels=(8, 8), width=0.035,
                           pipelines=[pipe])
    cam.parent = w
    cam.quiet = True
    cam.pixel_samples = 64
    cam.ray_extinction_prob = 0.0
    cam.observe(seed=7)
    vals = pipe.frame.mean
    assert np.isfinite(vals).all() and (vals > 0).all()
    # furnace: the frame-average power matches etendue * d_lambda (per-pixel
    # values carry the one-sample-MIS variance at this sample count)
    expected = np.pi * (0.035 / 8) ** 2 * DLAM
    assert abs(vals.mean() - expected) / expected < 0.05, (vals.mean(), expected)


def test_vector_camera_furnace():
    """VectorCamera in a unity furnace must read exactly 1.0 radiance per
    pixel for every sample count (regression: per-pixel calibrated rays must
    broadcast over the spp axis)."""
    from source_tpu.optical.observer import RadiancePipeline2D, VectorCamera

    nx, ny = 4, 3
    dirs = np.tile(np.array([0.0, 0.0, 1.0]), (nx, ny, 1))
    pipe = RadiancePipeline2D(accumulate=False)
    cam = VectorCamera(np.zeros((nx, ny, 3)), dirs, pipelines=[pipe])
    _furnace(cam)
    cam.pixel_samples = 5  # != 1 exercises the sample-axis broadcast
    cam.ray_extinction_prob = 0.0
    cam.observe(seed=7)
    assert pipe.frame.mean.shape == (nx, ny)
    assert np.allclose(pipe.frame.mean, DLAM, rtol=1e-4), pipe.frame.mean
