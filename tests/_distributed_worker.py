"""Worker for tests/test_distributed_multiproc.py: one process of a
2-process jax.distributed CPU group (or the single-process reference when
no coordinator env is set). Renders a fixed scene through the globally
sharded trace and saves THIS process's addressable slice of the result."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from source_tpu.parallel import distributed

    distributed.initialise()  # env-driven; no-op in the single-process run

    from jax.sharding import NamedSharding, PartitionSpec as P

    from source_tpu.compiler import SpectralConfig, compile_scene
    from source_tpu.core.math.transform import translate
    from source_tpu.core.math.vector import Point3D
    from source_tpu.core.scenegraph.node import World
    from source_tpu.optical import ConstantSF
    from source_tpu.optical.material import Lambert, UniformSurfaceEmitter
    from source_tpu.parallel.engine import default_mesh
    from source_tpu.primitive import Box, Sphere
    from source_tpu.tracer.wavefront import RayConfig, init_rays, trace_rays

    world = World()
    Box(Point3D(-3, -3, 4), Point3D(3, 3, 4.2), parent=world,
        material=UniformSurfaceEmitter(ConstantSF(2.0)))
    Sphere(0.6, parent=world, transform=translate(0, 0, 2),
           material=Lambert(ConstantSF(0.5)))
    scene = compile_scene(world, SpectralConfig(400.0, 700.0, 4))
    cfg = RayConfig(max_depth=4, extinction_prob=0.0, max_iters=4,
                    importance_sampling=False, early_exit=False)

    N = 256  # global ray count, divides over 8 devices
    rng = np.random.RandomState(0)
    o_all = np.concatenate(
        [rng.uniform(-1, 1, (N, 2)), np.full((N, 1), -2.0)],
        axis=1).astype(np.float32)
    d_all = (np.array([0, 0, 3.0]) - o_all)
    d_all /= np.linalg.norm(d_all, axis=-1, keepdims=True)
    d_all = d_all.astype(np.float32)

    engine = distributed.DistributedEngine()
    mesh = engine.mesh
    start, stop = distributed.host_local_shard(N)
    o = distributed.make_global_array(mesh, "rays", o_all[start:stop])
    d = distributed.make_global_array(mesh, "rays", d_all[start:stop])

    tile = NamedSharding(mesh, P("rays"))

    @jax.jit
    def run(o, d):
        st = init_rays(o, d, scene.bins)
        return trace_rays(scene, cfg, st, jax.random.PRNGKey(5)).radiance

    with mesh:
        rad = jax.jit(run, in_shardings=(tile, tile), out_shardings=tile)(o, d)

    # collect THIS process's rows of the global result
    local = np.full((stop - start, scene.bins), np.nan, np.float32)
    for shard in rad.addressable_shards:
        sl = shard.index[0]
        s = (sl.start or 0) - start
        e = (sl.stop if sl.stop is not None else N) - start
        local[s:e] = np.asarray(shard.data)
    assert np.isfinite(local).all()
    prefix = os.environ["_OUT_PREFIX"]
    np.save(prefix + "_radiance.npy", local)
    np.save(prefix + "_meta.npy",
            np.array([jax.process_count(), len(jax.devices())]))
    print("worker done", jax.process_index(), jax.process_count())


if __name__ == "__main__":
    main()
