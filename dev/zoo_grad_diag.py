"""A/B the zoo-scene table gradients: multi-bounce span vs per-bounce vs XLA."""
import os, sys
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
os.environ["SOURCE_TPU_FUSED"] = "1"
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
from source_tpu.primitive import Box, Cone, Cylinder, Parabola, Sphere
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
cfg = _cfg(compact_schedule=((4, 2),))
o, d = _rays(256, seed=2)
key = jax.random.PRNGKey(13)
target = jnp.zeros((256, B), jnp.float32)

def run(mode):
    os.environ["SOURCE_TPU_SPAN"] = mode
    return render_loss_and_grads(scene, cfg, o, d, key, target)

l_multi, g_multi = run("multi")
print("multi done", flush=True)
l_per, g_per = run("perbounce")
print("per done", flush=True)
os.environ["SOURCE_TPU_FUSED"] = "0"
l_ref, g_ref = render_loss_and_grads(scene, cfg, o, d, key, target)
print("loss multi/per/ref:", float(l_multi), float(l_per), float(l_ref))
for f in ["leaf_w2l", "leaf_params", "mat_params", "mat_spectra", "mat_scalars", "entity_w2l"]:
    a = np.asarray(getattr(g_ref, f), np.float64)
    m = np.asarray(getattr(g_multi, f), np.float64)
    p = np.asarray(getattr(g_per, f), np.float64)
    sc = max(np.abs(a).max(), 1e-6)
    print(f, "| multi-vs-ref:", np.abs(m-a).max()/sc,
          "| per-vs-ref:", np.abs(p-a).max()/sc,
          "| multi-vs-per:", np.abs(m-p).max()/max(np.abs(p).max(),1e-6), flush=True)
    if f == "leaf_w2l":
        err = np.abs(m-a)/sc
        idx = np.unravel_index(np.argmax(err), err.shape)
        print("  worst leaf_w2l idx:", idx, "ref:", a[idx], "multi:", m[idx], "per:", p[idx])
