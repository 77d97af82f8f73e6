"""Headline benchmark: Cornell box 512x512 forward+backward rays/s per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "rays/s/chip", "vs_baseline": N}

Protocol (BASELINE.md): the reference (raysect) publishes no numbers and
cannot be built in this image (no cython), so ``vs_baseline`` is computed
against a documented estimate of the reference's multicore-CPU throughput on
the same scene: 2.0e5 rays/s (raysect's canonical unit, printed by
optical/observer/base/observer.pyx:500-511; typical order for the Cornell
box demo on a modern multicore host).

The measured quantity is path *segments* traced per second through the full
differentiable pipeline (forward wavefront trace + reverse-mode gradients
w.r.t. every scene parameter), which matches the reference's ray accounting
(daughter rays counted individually).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

REFERENCE_CPU_RAYS_PER_S = 2.0e5  # documented estimate, see module docstring

WIDTH = HEIGHT = 512
BINS = 15
MAX_DEPTH = 16
MAX_ITERS = 24
TIMED_STEPS = 5


def main():
    import jax
    import jax.numpy as jnp

    from demos.cornell_box import build_world
    from source_tpu.compiler import SpectralConfig, compile_scene
    from source_tpu.parallel.engine import render_batch, render_loss_and_grads
    from source_tpu.tracer.wavefront import RayConfig

    # full flagship scene INCLUDING the dielectric glass prisms (the hard
    # path: refraction roulette + Beer-Lambert volumes), per VERDICT r1
    world = build_world(glass=True)
    scene = compile_scene(world, SpectralConfig(375.0, 740.0, BINS))
    cfg = RayConfig(
        max_depth=MAX_DEPTH,
        extinction_prob=0.1,
        extinction_min_depth=3,
        importance_sampling=True,
        important_path_weight=0.25,
        max_iters=MAX_ITERS,
        # single-chip stream compaction: Cornell alive fractions are ~19%
        # after 3 bounces and ~2% after 6, so 4x shrink stages have ample
        # headroom (see tracer/wavefront.py trace_rays_diff)
        compact_schedule=((3, 4), (3, 4)),
    )

    # pinhole camera rays over the full 512x512 frame (1 sample/pixel/step)
    n = WIDTH * HEIGHT
    xs = (jnp.arange(WIDTH, dtype=jnp.float32) + 0.5) / WIDTH - 0.5
    ys = (jnp.arange(HEIGHT, dtype=jnp.float32) + 0.5) / HEIGHT - 0.5
    px, py = jnp.meshgrid(xs, ys, indexing="ij")
    d = jnp.stack(
        [px.ravel() * 0.8, py.ravel() * 0.8, jnp.ones(n, jnp.float32)], axis=-1
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -3.3], jnp.float32), (n, 3))
    target = jnp.zeros((n, BINS), jnp.float32)

    fwd = jax.jit(
        lambda s, key: render_batch(s, cfg, o, d, key)
    )
    step = jax.jit(
        lambda s, key: render_loss_and_grads(s, cfg, o, d, key, target)
    )

    # segment count for the rays/s denominator (forward pass, same estimator)
    key = jax.random.PRNGKey(0)
    final = fwd(scene, key)
    segments = int(final.segments)

    # warmup/compile then timed fwd+bwd steps
    loss, grads = step(scene, key)
    jax.block_until_ready((loss, grads))
    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        loss, grads = step(scene, jax.random.PRNGKey(i + 1))
    jax.block_until_ready((loss, grads))
    dt = (time.perf_counter() - t0) / TIMED_STEPS

    rays_per_s = segments / dt
    print(
        json.dumps(
            {
                "metric": "cornell_box_512_fwd_bwd",
                "value": round(rays_per_s, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_s / REFERENCE_CPU_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
