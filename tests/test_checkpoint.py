"""Pipeline checkpoint/resume (reference's mid-render pickling idiom)."""

import os

import numpy as np

from source_tpu.core.scenegraph import World
from source_tpu.optical.material import UnitySurfaceEmitter
from source_tpu.optical.observer import OrthographicCamera, PowerPipeline2D
from source_tpu.primitive import Sphere


def _cam(pipe):
    w = World()
    Sphere(radius=10.0, parent=w, material=UnitySurfaceEmitter())
    cam = OrthographicCamera(pixels=(8, 8), width=1.0, pipelines=[pipe], parent=w)
    cam.pixel_samples = 16
    cam.ray_extinction_prob = 0.0
    cam.quiet = True
    return cam


def test_checkpoint_resume_equivalence(tmp_path):
    # two straight accumulating passes
    ref = PowerPipeline2D(accumulate=True)
    cam = _cam(ref)
    cam.observe(seed=1)
    cam.observe(seed=2)

    # pass -> save -> new pipeline -> load -> pass
    a = PowerPipeline2D(accumulate=True)
    _cam(a).observe(seed=1)
    path = os.path.join(tmp_path, "ckpt.npz")
    a.save_state(path)
    b = PowerPipeline2D(accumulate=True)
    b.load_state(path)
    _cam(b).observe(seed=2)

    assert np.allclose(b.frame.mean, ref.frame.mean, rtol=1e-6)
    assert np.array_equal(b.frame.samples, ref.frame.samples)
    assert np.allclose(b.frame.variance, ref.frame.variance, rtol=1e-5)
