"""A/B compact_schedule for the mesh e2e scene: wall time + segments +
overflow (roulette pressure) per schedule."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from demos.mesh_render import build_world
    from source_tpu.compiler import SpectralConfig, compile_scene
    from source_tpu.parallel.engine import render_batch
    from source_tpu.tracer.wavefront import RayConfig

    world = build_world(small=True)
    spec = SpectralConfig(375.0, 740.0, 12)
    scene = compile_scene(world, spec)
    n = 192 * 192 * 32
    key = jax.random.PRNGKey(0)
    o = jnp.tile(jnp.array([[0.0, 1.0, -4.5]], jnp.float32), (n, 1))
    kd = jax.random.normal(key, (n, 3))
    d = kd / jnp.linalg.norm(kd, axis=1, keepdims=True)

    import json
    names = sys.argv[1:] or ["r4_default", "early_2_4"]
    ALL = {
        "r4_default": ((3, 4), (3, 4)),
        "early_2_4": ((2, 4), (3, 4)),
        "very_early": ((2, 8), (3, 4)),
        "one_2": ((1, 2), (1, 2), (3, 4)),
        "one_4": ((1, 4), (2, 4)),
    }
    SCHEDULES = {k: ALL[k] for k in names}
    for name, sched in SCHEDULES.items():
        cfg = RayConfig(max_iters=16, max_depth=12, compact_schedule=sched)
        fn = jax.jit(lambda k, s=scene, c=cfg: render_batch(s, c, o, d, k))
        st = fn(key); jax.block_until_ready(st.radiance)  # compile
        ts = []
        for _ in range(3):
            t0 = time.time(); st = fn(key); jax.block_until_ready(st.radiance)
            ts.append(time.time() - t0)
        ts.sort()
        segs = int(st.segments)
        ovf = int(st.overflow)
        tm = ts[len(ts) // 2]
        print(f"{name}: {tm*1e3:.1f} ms  segs={segs}  ovf={ovf}  "
              f"rate={segs/tm:.3g}", flush=True)


if __name__ == "__main__":
    main()
