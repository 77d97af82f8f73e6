"""Roofline / speed-of-light analysis for the wavefront trace kernel.

Jits one full forward trace on the flagship Cornell-box (glass) scene,
pulls XLA's own cost model for the compiled program (FLOPs + bytes
accessed), measures wall time, and reports achieved FLOP/s and HBM
bandwidth against the chip peaks — the roofline bound consumption
max(flops/peak_flops, bytes/peak_bw) tells how far the kernel is from
speed of light and WHICH wall it is approaching.

TPU v5e peaks (public spec): 394 TFLOP/s bf16 MXU, 197 TFLOP/s fp32-ish
effective (the tracer is elementwise-f32 dominated, so the relevant
ceiling is the VPU/HBM roofline), 819 GB/s HBM.

Usage: python benchmarks/mfu.py          (real TPU)
       PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/mfu.py
Writes benchmarks/mfu.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RAYS = 1 << 18
BINS = 15
MAX_ITERS = 24

PEAK_HBM_GBS = 819.0  # v5e
PEAK_BF16_TFLOPS = 394.0  # v5e MXU
PEAK_F32_TFLOPS = 98.5  # v5e MXU f32 (bf16/4); VPU elementwise is lower still


def main():
    import jax
    import jax.numpy as jnp

    from demos.cornell_box import build_world
    from source_tpu.compiler import SpectralConfig, compile_scene
    from source_tpu.parallel.engine import render_batch, render_loss_and_grads
    from source_tpu.tracer.wavefront import RayConfig

    world = build_world(glass=True)
    scene = compile_scene(world, SpectralConfig(375.0, 740.0, BINS))
    cfg = RayConfig(max_depth=16, extinction_prob=0.1, extinction_min_depth=3,
                    max_iters=MAX_ITERS, compact_schedule=((3, 4), (3, 4)))

    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (N_RAYS, 2))
    d = jnp.stack([(u[:, 0] - 0.5) * 0.8, (u[:, 1] - 0.5) * 0.8,
                   jnp.ones(N_RAYS)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -3.3], jnp.float32), (N_RAYS, 3))
    target = jnp.zeros((N_RAYS, BINS), jnp.float32)

    report = {}
    for name, fn in [
        ("forward", lambda s, k: render_batch(s, cfg, o, d, k).radiance),
        ("fwd_bwd", lambda s, k: render_loss_and_grads(s, cfg, o, d, k, target)),
    ]:
        lowered = jax.jit(fn).lower(scene, key)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_accessed = float(cost.get("bytes accessed", 0.0))

        out = compiled(scene, key)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            out = compiled(scene, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps

        tflops = flops / dt / 1e12
        gbs = bytes_accessed / dt / 1e9
        flop_frac = tflops / PEAK_F32_TFLOPS
        bw_frac = gbs / PEAK_HBM_GBS
        segments = N_RAYS * MAX_ITERS  # upper bound (pre-compaction width)
        report[name] = {
            "wall_s": round(dt, 4),
            "xla_tflops": round(tflops, 2),
            "xla_hbm_gbs": round(gbs, 1),
            "flop_peak_frac": round(flop_frac, 4),
            "hbm_peak_frac": round(bw_frac, 4),
            "roofline_bound": "hbm" if bw_frac > flop_frac else "flops",
            "roofline_consumption": round(max(bw_frac, flop_frac), 4),
            "segments_per_s_upper": round(segments / dt, 1),
        }
        print(json.dumps({"kernel": name, **report[name]}), flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mfu.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
