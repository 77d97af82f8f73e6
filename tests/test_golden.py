"""Golden-image regression: Cornell box XYZ block means.

The golden (tests/data/cornell_golden_blocks.npy) is an 8x8 grid of
block-averaged CIE XYZ values from a 64x64 render at 64 spp. Block
averaging + a generous tolerance makes the check robust to RNG-stream
changes across jax versions while still catching structural regressions
(wrong wall colours, broken MIS, dead glass paths).
"""

import os

import numpy as np

_GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                       "cornell_golden_blocks.npy")


def test_cornell_box_matches_golden_blocks():
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
    cam.observe(seed=54321)  # different seed than the golden: MC tolerance

    golden = np.load(_GOLDEN)
    xyz = rgb.xyz_frame.mean
    blocks = xyz.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))

    # overall radiometry within MC noise of the stored frame
    assert abs(blocks[..., 1].mean() - golden[..., 1].mean()) < 0.05 * golden[..., 1].mean()
    # per-block luminance: allow MC noise but catch structural breakage
    denom = np.maximum(golden[..., 1], 0.05)
    rel = np.abs(blocks[..., 1] - golden[..., 1]) / denom
    assert np.percentile(rel, 90) < 0.25, rel
    # colour structure: red wall block redder than green wall block (the
    # pinhole image plane inverts x: block x=0 faces the red +x wall)
    red_side = blocks[0, 4]
    green_side = blocks[7, 4]
    assert red_side[0] / max(red_side[1], 1e-6) > green_side[0] / max(green_side[1], 1e-6)
