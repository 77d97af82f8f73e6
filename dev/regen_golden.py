"""Regenerate tests/data/cornell_golden_blocks.npy.

Round-4 regeneration: the box face-pick rule changed from
normalised-coordinate (fp-chaotic on the zero-thickness Cornell walls —
a fraction of wall hits received edge-on normals and lost energy) to the
robust distance-to-face-plane rule (primitive/analytic.py normal_box),
raising mean frame luminance ~23% to the physically correct value.
Renders the SAME protocol as tests/test_golden.py at a different seed.
"""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np

from demos.cornell_box import build_world
from source_tpu.core.math.transform import translate
from source_tpu.optical.observer import PinholeCamera, RGBPipeline2D

world = build_world(glass=True)
rgb = RGBPipeline2D(accumulate=True, name="golden")
cam = PinholeCamera((64, 64), parent=world, pipelines=[rgb])
cam.transform = translate(0, 0, -3.3)
cam.pixel_samples = 64
cam.spectral_bins = 15
cam.ray_max_depth = 24
cam.max_wavefront_iters = 32
cam.ray_extinction_prob = 0.05
cam.quiet = True
cam.observe(seed=12345)
xyz = rgb.xyz_frame.mean
blocks = xyz.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))
np.save("/root/repo/tests/data/cornell_golden_blocks.npy", blocks)
print("saved, mean Y:", blocks[..., 1].mean())
