"""Multi-host scaffolding (parallel/distributed.py) — single-process paths.

Real multi-host runs need N processes over DCN; these tests cover the
process-group wrapper's no-op path, the global-array assembly on a local
mesh, and the DistributedEngine sharding contract on the virtual 8-device
CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from source_tpu.parallel import distributed
from source_tpu.parallel.engine import default_mesh


def test_initialise_single_process_noop():
    distributed.initialise()  # no coordinator configured -> safe no-op
    assert not distributed.is_initialised()
    assert distributed.process_count() == 1
    assert distributed.process_index() == 0


def test_host_local_shard():
    start, stop = distributed.host_local_shard(64)
    assert (start, stop) == (0, 64)


def test_make_global_array_single_process():
    mesh = default_mesh()
    arr = np.arange(32 * 3, dtype=np.float32).reshape(32, 3)
    out = distributed.make_global_array(mesh, "rays", arr)
    np.testing.assert_allclose(np.asarray(out), arr)
    # sharded over the mesh axis
    assert len(out.sharding.device_set) == mesh.devices.size


def test_distributed_engine_observe():
    from source_tpu.core import Point3D, translate
    from source_tpu.core.scenegraph import World
    from source_tpu.optical import ConstantSF
    from source_tpu.optical.material import UniformSurfaceEmitter
    from source_tpu.optical.observer import PinholeCamera, PowerPipeline2D
    from source_tpu.primitive import Box

    world = World()
    Box(Point3D(-5, -5, 2), Point3D(5, 5, 2.2), parent=world,
        material=UniformSurfaceEmitter(ConstantSF(1.0)))
    engine = distributed.DistributedEngine()
    assert engine.n_devices == len(jax.devices())
    assert engine.n_hosts == 1
    power = PowerPipeline2D()
    cam = PinholeCamera((8, 8), parent=world, pipelines=[power],
                        transform=translate(0, 0, -1),
                        render_engine=engine)
    cam.pixel_samples = 16
    cam.spectral_bins = 2
    cam.quiet = True
    cam.observe(seed=2)
    assert power.frame.mean.max() > 0.0
