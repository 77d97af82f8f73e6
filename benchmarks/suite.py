"""Per-scene benchmark suite (BASELINE.md measurement protocol).

Runs the demo scenes through the real observer pipeline and records the
canonical throughput statistic (rays/s, the reference's unit printed by
optical/observer/base/observer.pyx:500-511) for each. Each scene is
observed twice: the first pass compiles the wavefront kernels, the second
pass is the timed measurement (the reference's statistic likewise excludes
module import/compile cost — it times the render loop only).

Usage:  python benchmarks/suite.py [scene ...]
        (default: all scenes)

Prints one JSON line per scene and writes benchmarks/results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


REPEATS = 9
STALL_RETRY_BUDGET = 6


def _observe_timed(camera):
    """Stall-robust rays/s statistic (VERDICT r4 next #4).

    The axon relay injects tens-of-ms hiccups and occasional multi-x
    stalls (benchmarks/launchprobe.json), which at round-4 speeds swamp a
    ~170 ms pass (observed spreads up to 103%). Protocol: >=REPEATS
    passes; a pass below HALF the best rate so far is a relay stall and is
    re-run (bounded by STALL_RETRY_BUDGET, stall count reported); the
    kept rates are 25%-trimmed at both ends and the median + spread OF THE
    TRIMMED SET are reported. Reference statistic being mimicked:
    optical/observer/base/observer.pyx:500-511."""
    camera.quiet = True
    camera.observe(seed=1)  # compile + warm pass
    rates = []
    stalls = 0
    seed = 2
    while len(rates) < REPEATS and stalls <= STALL_RETRY_BUDGET:
        for p in camera.pipelines:
            if hasattr(p, "accumulate"):
                p.accumulate = False  # reset stats so each timed pass is clean
        camera.observe(seed=seed)
        seed += 1
        r = camera.rays_per_second
        if rates and r < 0.5 * max(rates):
            stalls += 1  # relay stall: excluded, counted, re-run
            continue
        rates.append(r)
    rates.sort()
    k = len(rates) // 4
    trimmed = rates[k: len(rates) - k] if len(rates) > 2 * k else rates
    median = trimmed[len(trimmed) // 2]
    spread = (trimmed[-1] - trimmed[0]) / median
    return median, spread, stalls


def bench_cornell():
    from demos.cornell_box import build_world
    from source_tpu.optical.observer import PinholeCamera, RGBPipeline2D
    from source_tpu.core import translate

    world = build_world(glass=False)
    rgb = RGBPipeline2D()
    camera = PinholeCamera((256, 256), fov=45, parent=world,
                           transform=translate(0, 0, -3.3), pipelines=[rgb])
    camera.pixel_samples = 64
    camera.spectral_bins = 15
    camera.ray_max_depth = 16
    camera.max_wavefront_iters = 24
    camera.compact_schedule = ((3, 4), (3, 4))
    return _observe_timed(camera)


def bench_prism():
    from demos.prism import build_world
    from source_tpu.core import rotate, translate
    from source_tpu.optical.observer import PinholeCamera, RGBPipeline2D

    world = build_world()
    rgb = RGBPipeline2D()
    camera = PinholeCamera(
        (256, 144), fov=45, parent=world,
        transform=translate(0, 0.075, -0.05) * rotate(180, -45, 0)
        * translate(0, 0, -0.75),
        pipelines=[rgb],
    )
    camera.pixel_samples = 32
    camera.spectral_bins = 16
    camera.spectral_rays = 4  # dispersion slicing (4 slices keeps compile cost sane)
    camera.ray_importance_sampling = True
    camera.ray_important_path_weight = 0.75
    camera.ray_max_depth = 32
    camera.max_wavefront_iters = 40
    return _observe_timed(camera)


def bench_csg():
    from demos.csg import build_world
    from source_tpu.core import translate
    from source_tpu.optical.observer import PinholeCamera, RGBPipeline2D

    world = build_world()
    rgb = RGBPipeline2D()
    camera = PinholeCamera((256, 256), fov=75, parent=world,
                           transform=translate(0, 0, -4), pipelines=[rgb])
    camera.pixel_samples = 64
    camera.spectral_bins = 15
    camera.ray_max_depth = 24
    camera.max_wavefront_iters = 32
    camera.compact_schedule = ((4, 4), (4, 4))
    return _observe_timed(camera)


def bench_mis():
    from demos.multiple_importance_sampling import build_world
    from source_tpu.core import rotate, translate
    from source_tpu.optical.observer import PinholeCamera, RGBPipeline2D

    world = build_world()
    rgb = RGBPipeline2D()
    camera = PinholeCamera((256, 192), fov=45, parent=world,
                           transform=translate(0, 1.2, -3.5) * rotate(0, -5, 0),
                           pipelines=[rgb])
    camera.pixel_samples = 64
    camera.spectral_bins = 12
    camera.ray_importance_sampling = True
    camera.ray_important_path_weight = 0.3
    camera.ray_max_depth = 12
    camera.max_wavefront_iters = 16
    camera.compact_schedule = ((3, 4), (3, 4))
    return _observe_timed(camera)


def bench_mesh():
    from demos.mesh_render import build_world
    from source_tpu.core import rotate, translate
    from source_tpu.optical.observer import PinholeCamera, RGBPipeline2D

    world = build_world(small=True)
    rgb = RGBPipeline2D()
    camera = PinholeCamera((192, 192), fov=45, parent=world,
                           transform=translate(0, 1.0, -4.5) * rotate(0, -8, 0),
                           pipelines=[rgb])
    camera.pixel_samples = 32
    camera.spectral_bins = 12
    camera.ray_max_depth = 12
    camera.max_wavefront_iters = 16
    # round-5 schedule A/B on v5e (dev/mesh_sched_ab.py): the open scene
    # kills most lanes within 2 bounces, and the dense all-pairs mesh
    # intersect pays per LANE x TRIANGLE whether lanes are alive or not, so
    # early compaction is a pure win here — ((2,8),(3,4)) traced identical
    # segments with ZERO roulette overflow at 592 vs 904 ms (1.53x).
    camera.compact_schedule = ((2, 8), (3, 4))
    return _observe_timed(camera)


SCENES = {
    "cornell": bench_cornell,
    "prism": bench_prism,
    "csg": bench_csg,
    "mis": bench_mis,
    "mesh": bench_mesh,
}


def main():
    wanted = [a for a in sys.argv[1:] if not a.startswith("-")] or list(SCENES)
    results = {}
    for name in wanted:
        t0 = time.time()
        rays_s, spread, stalls = SCENES[name]()
        results[name] = {
            "rays_per_s_median": round(rays_s, 1),
            "trimmed_spread_pct": round(100.0 * spread, 1),
            "repeats": REPEATS,
            "stalls_excluded": stalls,
        }
        print(json.dumps({
            "metric": f"{name}_fwd", "value": round(rays_s, 1),
            "unit": "rays/s/chip",
            "trimmed_spread_pct": round(100.0 * spread, 1),
            "stalls_excluded": stalls,
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)


if __name__ == "__main__":
    main()
