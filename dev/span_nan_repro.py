"""Reproduce the multi-span NaN via the real pipeline, then bisect."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["SOURCE_TPU_FUSED"] = "1"
os.environ["SOURCE_TPU_SPAN"] = "multi"
import numpy as np, jax, jax.numpy as jnp

from tests.test_fused import _rays, _cfg
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.math.transform import rotate_x, translate
from source_tpu.core.math.vector import Point3D
from source_tpu.core.scenegraph.node import World
from source_tpu.optical import InterpolatedSF
from source_tpu.optical.material import (
    AbsorbingSurface, AnisotropicSurfaceEmitter, Checkerboard, Conductor,
    Lambert, NullSurface, PerfectReflectingSurface, RoughConductor,
    UniformSurfaceEmitter, UniformVolumeEmitter,
)
from source_tpu.primitive import Box, Cone, Cylinder, Parabola, Sphere

B = 5
w = World()
ns = InterpolatedSF([400, 700], [1.2, 1.1])
ks = InterpolatedSF([400, 700], [5.0, 4.0])
spec = InterpolatedSF([400, 700], [1.0, 3.0])
mats = [
    Conductor(ns, ks), RoughConductor(ns, ks, 0.3),
    AnisotropicSurfaceEmitter(spec, 1.0, 2.0),
    Checkerboard(0.3, spec, InterpolatedSF([400, 700], [3.0, 1.0]), 1.0),
    PerfectReflectingSurface(), NullSurface(), AbsorbingSurface(),
    UniformVolumeEmitter(spec, 0.7), Lambert(InterpolatedSF([400, 700], [0.4, 0.6])),
]
rng = np.random.RandomState(5)
for i, mat in enumerate(mats):
    x, y, z = rng.uniform(-2.0, 2.0, 3)
    t = translate(x, y, z) * rotate_x(float(rng.uniform(0, 90)))
    kind = i % 5
    if kind == 0: Sphere(0.5, parent=w, transform=t, material=mat)
    elif kind == 1: Box(Point3D(-0.4, -0.3, -0.2), Point3D(0.4, 0.3, 0.2), parent=w, transform=t, material=mat)
    elif kind == 2: Cylinder(0.35, 0.7, parent=w, transform=t, material=mat)
    elif kind == 3: Cone(0.35, 0.6, parent=w, transform=t, material=mat)
    else: Parabola(0.35, 0.5, parent=w, transform=t, material=mat)
Box(Point3D(-3, -3, 4.0), Point3D(3, 3, 4.1), parent=w, material=UniformSurfaceEmitter(spec, 2.0))
scene = compile_scene(w, SpectralConfig(375.0, 740.0, B))

from source_tpu.parallel.engine import render_loss_and_grads
from source_tpu.tracer.wavefront import RayConfig

o, d = _rays(256, seed=2)
key = jax.random.PRNGKey(13)
target = jnp.zeros((256, B), jnp.float32)

def run(tag, cfg):
    loss, g = render_loss_and_grads(scene, cfg, o, d, key, target)
    w2l = np.asarray(g.leaf_w2l)
    bad_leaves = sorted(set(np.nonzero(~np.isfinite(w2l))[0].tolist()))
    print(tag, "loss", float(loss), "nan leaves:", bad_leaves,
          "nan count:", int((~np.isfinite(w2l)).sum()), flush=True)

run("iters=8 sched=()", _cfg(compact_schedule=(), max_iters=8))
run("iters=8 sched=((4,2),)", _cfg(compact_schedule=((4, 2),)))

