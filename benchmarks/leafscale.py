"""Analytic-scene leaf-count scaling microbench (VERDICT r2 missing #1).

An L-sphere grid inside an emitting enclosure, 131k incoherent rays,
12 bounces, forward trace: rays/s vs total leaf count. Round-2 baseline
(per-type streaming, VPU mat-vec transforms): LINEAR cost —
L=33 -> 7.4M rays/s, 109 -> 1.15M, 257 -> 0.65M, 501 -> 0.43M.

Usage: python benchmarks/leafscale.py          (real TPU)
Writes benchmarks/leafscale.json.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RAYS = 1 << 17
MAX_ITERS = 12
GRID_COUNTS = [32, 108, 256, 500, 1000]


def build_grid_world(n_spheres):
    from source_tpu.core.math.transform import translate
    from source_tpu.core.scenegraph import World
    from source_tpu.optical.material import (
        AbsorbingSurface, Lambert, UniformSurfaceEmitter,
    )
    from source_tpu.optical.spectrum import ConstantSF
    from source_tpu.primitive import Sphere

    w = World()
    Sphere(radius=40.0, parent=w,
           material=UniformSurfaceEmitter(ConstantSF(1.0)))
    side = max(1, round(n_spheres ** (1.0 / 3.0)))
    placed = 0
    spacing = 2.2
    half = 0.5 * (side - 1) * spacing
    for i in range(side):
        for j in range(side):
            for k in range(side):
                if placed >= n_spheres:
                    break
                mat = Lambert(ConstantSF(0.6)) if placed % 2 else AbsorbingSurface()
                Sphere(radius=0.8, parent=w,
                       transform=translate(i * spacing - half,
                                           j * spacing - half,
                                           k * spacing - half),
                       material=mat)
                placed += 1
    return w, placed + 1


def main():
    import jax
    import jax.numpy as jnp

    from source_tpu.compiler import SpectralConfig, compile_scene
    from source_tpu.parallel.engine import render_batch
    from source_tpu.tracer.wavefront import RayConfig

    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (N_RAYS, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jax.random.normal(jax.random.fold_in(key, 1), (N_RAYS, 3)) * 3.0

    cfg = RayConfig(max_depth=MAX_ITERS, extinction_prob=0.1,
                    extinction_min_depth=3, importance_sampling=False,
                    max_iters=MAX_ITERS)

    results = {}
    for n in GRID_COUNTS:
        world, leaves = build_grid_world(n)
        scene = compile_scene(world, SpectralConfig(375.0, 740.0, 8))
        fn = jax.jit(lambda s, k: render_batch(s, cfg, o, d, k).segments)
        seg = fn(scene, key)
        jax.block_until_ready(seg)
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            seg = fn(scene, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(seg)
        dt = (time.perf_counter() - t0) / reps
        rate = N_RAYS / dt
        seg_rate = int(seg) / dt
        results[str(leaves)] = {
            "leaves": leaves, "wall_s": round(dt, 4),
            "rays_per_s": round(rate, 1),
            "segments_per_s": round(seg_rate, 1),
        }
        print(json.dumps(results[str(leaves)]), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "leafscale.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
