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
(daughter rays counted individually). Scene/config/ray batch are shared
with benchmarks/mfu.py (benchmarks/flagship.py) so the roofline "ceiling"
and this "achieved" number describe one program.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

REFERENCE_CPU_RAYS_PER_S = 2.0e5  # documented estimate, see module docstring

TIMED_STEPS = 5


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.flagship import BINS, build
    from source_tpu.parallel.engine import render_batch, render_loss_and_grads

    scene, cfg, o, d = build()
    target = jnp.zeros((o.shape[0], BINS), jnp.float32)

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
