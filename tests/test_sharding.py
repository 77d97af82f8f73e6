"""Multi-device sharding: observer tile kernel over an 8-device mesh.

Runs on the virtual CPU mesh (conftest forces
xla_force_host_platform_device_count=8). Validates SURVEY.md §2.12: pixel
tiles shard as the DP axis, scene tables replicate, results match the
single-device render.
"""

import numpy as np

import jax


def test_sharded_observe_matches_single_device():
    from source_tpu.core.scenegraph import World
    from source_tpu.optical.material import UnitySurfaceEmitter
    from source_tpu.optical.observer import OrthographicCamera, PowerPipeline2D
    from source_tpu.parallel.engine import ShardedEngine
    from source_tpu.primitive import Sphere

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"

    def render(engine):
        w = World()
        Sphere(radius=10.0, parent=w, material=UnitySurfaceEmitter())
        pipe = PowerPipeline2D(accumulate=False)
        cam = OrthographicCamera(pixels=(16, 16), width=1.0, pipelines=[pipe],
                                 parent=w, render_engine=engine)
        cam.pixel_samples = 8
        cam.ray_extinction_prob = 0.0
        cam.tile_size = 256  # divisible by 8 devices
        cam.quiet = True
        cam.observe(seed=3)
        return pipe.frame.mean.copy()

    single = render(None)
    sharded = render(ShardedEngine())
    assert np.allclose(single, sharded, rtol=1e-6)
    # furnace closed form: unit-sensitivity orthographic pixels read the
    # spectrally integrated unity radiance directly
    assert np.allclose(sharded, 365.0, rtol=1e-5)


def test_sharded_render_loss_and_grads():
    """Differentiable render over the mesh: gradients replicate correctly."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from demos.cornell_box import build_world
    from source_tpu.compiler import SpectralConfig, compile_scene
    from source_tpu.parallel.engine import default_mesh, render_loss_and_grads
    from source_tpu.tracer.wavefront import RayConfig

    scene = compile_scene(build_world(glass=False), SpectralConfig(375., 740., 4))
    mesh = default_mesh()
    n = 1024
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (n, 2))
    d = jnp.stack([(u[:, 0] - .5) * .8, (u[:, 1] - .5) * .8, jnp.ones(n)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray([0., 0., -3.3]), (n, 3))
    target = jnp.zeros((n, 4))
    cfg = RayConfig(max_depth=8, extinction_prob=0.1, extinction_min_depth=3,
                    importance_sampling=True, important_path_weight=0.25,
                    max_iters=10)

    tile = NamedSharding(mesh, P("rays"))
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda s, o, d, k, t: render_loss_and_grads(s, cfg, o, d, k, t),
        in_shardings=(None, tile, tile, repl, tile),
    )
    loss_sh, grads_sh = fn(scene, o, d, jax.random.PRNGKey(1), target)
    loss_1, grads_1 = jax.jit(
        lambda s, o, d, k, t: render_loss_and_grads(s, cfg, o, d, k, t)
    )(scene, o, d, jax.random.PRNGKey(1), target)
    assert abs(float(loss_sh) - float(loss_1)) < 1e-5 * max(1.0, abs(float(loss_1)))
    g_sh = jax.tree_util.tree_leaves(grads_sh)
    g_1 = jax.tree_util.tree_leaves(grads_1)
    for a, b in zip(g_sh, g_1):
        if jnp.issubdtype(a.dtype, jnp.floating):
            assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
