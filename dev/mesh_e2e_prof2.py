"""Attribute the mesh e2e device cost: full scene vs analytic-only vs
single-mesh variants, all through the same jitted render_batch."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time(); r = fn(); jax.block_until_ready(r)
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    from demos.mesh_render import build_world, icosphere, torus_knot
    from source_tpu.core import Point3D, translate, rotate
    from source_tpu.core.scenegraph import World
    from source_tpu.optical import ConstantSF
    from source_tpu.optical.library import d65_white, schott
    from source_tpu.optical.material import (Lambert, RoughConductor,
                                             UniformSurfaceEmitter)
    from source_tpu.primitive import Box, Mesh
    from source_tpu.compiler import SpectralConfig, compile_scene
    from source_tpu.parallel.engine import render_batch
    from source_tpu.tracer.wavefront import RayConfig

    spec = SpectralConfig(375.0, 740.0, 12)
    cfg = RayConfig(max_iters=16, max_depth=12,
                    compact_schedule=((3, 4), (3, 4)))
    n = 192 * 192 * 32
    key = jax.random.PRNGKey(0)
    o = jnp.tile(jnp.array([[0.0, 1.0, -4.5]], jnp.float32), (n, 1))
    kd = jax.random.normal(key, (n, 3))
    d = kd / jnp.linalg.norm(kd, axis=1, keepdims=True)

    def boxes(w):
        Box(Point3D(-10, -0.1, -10), Point3D(10, 0, 10), parent=w,
            material=Lambert(ConstantSF(0.6)))
        Box(Point3D(-10, 0, 4), Point3D(10, 6, 4.1), parent=w,
            material=Lambert(ConstantSF(0.3)))
        Box(Point3D(-1.5, 3.0, -1.5), Point3D(1.5, 3.2, 1.5), parent=w,
            material=UniformSurfaceEmitter(d65_white, 4.0))

    variants = {}

    w = build_world(small=True)
    variants["full"] = w

    w2 = World(); boxes(w2)
    variants["analytic_only"] = w2

    w3 = World(); boxes(w3)
    v, f = icosphere(2, radius=0.8)
    Mesh(v, f, smoothing=True, closed=True, parent=w3,
         transform=translate(-1.1, 0.8, 0.0), material=schott("N-BK7"))
    variants["sphere_mesh_only"] = w3

    w4 = World(); boxes(w4)
    v2, f2 = torus_knot(segments=64, sides=8)
    Mesh(v2, f2, smoothing=True, closed=True, parent=w4,
         transform=translate(1.2, 0.9, 0.3) * rotate(0, 70, 0),
         material=RoughConductor(ConstantSF(0.9), ConstantSF(6.0), 0.2))
    variants["knot_mesh_only"] = w4

    for name, world in variants.items():
        s = compile_scene(world, spec)
        fn = jax.jit(lambda k, s=s: render_batch(s, cfg, o, d, k))
        tm = timed(lambda: fn(key))
        print(f"{name}: {tm*1e3:.1f} ms")


if __name__ == "__main__":
    main()
