"""Roofline / speed-of-light analysis for the flagship benchmark program.

Jits the SAME program bench.py times (benchmarks/flagship.py: glass Cornell
512x512, identical RayConfig), pulls XLA's cost model for the compiled
binary (FLOPs + bytes accessed), measures wall time, and reports achieved
FLOP/s and HBM bandwidth against the chip peaks. The roofline consumption
max(flops/peak_flops, bytes/peak_bw) says how far the program is from
speed of light and WHICH wall it approaches; for this bandwidth-bound
tracer,

    ceiling_segments_per_s = achieved_segments_per_s / hbm_peak_frac

is the rate the SAME program would reach at 100% of HBM bandwidth, so
``achieved_vs_ceiling`` == hbm_peak_frac is the single number BASELINE.md
tracks (VERDICT r2 #1: one shared config, one defensible fraction).

TPU v5e peaks (public spec): 394 TFLOP/s bf16 MXU, ~98 TFLOP/s f32,
819 GB/s HBM.

Usage: python benchmarks/mfu.py          (real TPU)
Writes benchmarks/mfu.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_HBM_GBS = 819.0  # v5e
PEAK_BF16_TFLOPS = 394.0  # v5e MXU
PEAK_F32_TFLOPS = 98.5  # v5e MXU f32 (bf16/4); VPU elementwise is lower still


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.flagship import BINS, build
    from source_tpu.parallel.engine import render_batch, render_loss_and_grads

    scene, cfg, o, d = build()
    target = jnp.zeros((o.shape[0], BINS), jnp.float32)
    key = jax.random.PRNGKey(0)

    # actual traced segments (roulette-truncated) — the SAME denominator
    # bench.py uses, not the pre-compaction upper bound
    segments = int(jax.jit(
        lambda s, k: render_batch(s, cfg, o, d, k).segments
    )(scene, key))

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
        seg_rate = segments / dt
        report[name] = {
            "wall_s": round(dt, 4),
            "xla_tflops": round(tflops, 2),
            "xla_hbm_gbs": round(gbs, 1),
            "flop_peak_frac": round(flop_frac, 4),
            "hbm_peak_frac": round(bw_frac, 4),
            "roofline_bound": "hbm" if bw_frac > flop_frac else "flops",
            "segments_per_s": round(seg_rate, 1),
            "ceiling_segments_per_s": round(
                seg_rate / max(max(bw_frac, flop_frac), 1e-9), 1
            ),
            "achieved_vs_ceiling": round(max(bw_frac, flop_frac), 4),
        }
        print(json.dumps({"kernel": name, **report[name]}), flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mfu.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
