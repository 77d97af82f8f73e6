"""Multi-device rendering and differentiable-render training steps.

TPU-native replacement for the reference's MulticoreEngine task farm
(raysect/core/workflow.py:123-326, SURVEY.md §2.12): the DP axis is the ray
batch. Scene tables (a few KB) are replicated to every device; pixel tiles
are sharded along a 1-D ``rays`` mesh axis; per-pixel statistics come back
sharded and fold on the host, so the only collective in the forward pass is
the final gather. For differentiable rendering, parameter gradients are
reduced across the mesh by XLA (psum inserted automatically from the
replicated-in/replicated-out sharding contract), overlapping with the
backward pass.
"""

#
# NOTE (multi-chip + Pallas): the Pallas kernels (leaf BVH, fused bounce,
# mesh packet) operate on each shard's local batch. Under automatic jit
# sharding on a MULTI-chip mesh, wrap the trace in shard_map (or shard at
# the host level as DistributedEngine does per process) so each device
# runs the kernel on its own shard; the virtual CPU mesh used in tests
# never engages the kernels (they are TPU-gated).

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..compiler.scene import CompiledScene
from ..tracer.wavefront import RayConfig, init_rays, trace_rays, trace_rays_diff

__all__ = ["default_mesh", "ShardedEngine", "render_batch", "render_loss_and_grads",
           "RenderEngine", "SerialEngine", "MulticoreEngine"]


def default_mesh(devices=None, axis_name="rays"):
    """A 1-D mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


class ShardedEngine:
    """Render-engine strategy sharding pixel tiles across a device mesh.

    Passed to observers as ``render_engine``; the observer's tile kernel is
    jitted with the ray/tile axis sharded over ``axis_name`` and scene
    tables replicated.
    """

    def __init__(self, mesh=None, axis_name="rays"):
        self.mesh = mesh if mesh is not None else default_mesh()
        self.axis_name = axis_name

    @property
    def n_devices(self):
        return self.mesh.devices.size

    def shard_kernel(self, kernel):
        """Wrap an observer tile kernel with sharding annotations.

        kernel(scene, px, py, sensitivity, cam_to_world, key) -> (outs, segs)
        px/py/sensitivity are sharded on their leading (tile) axis.
        """
        mesh = self.mesh
        tile = NamedSharding(mesh, P(self.axis_name))
        repl = NamedSharding(mesh, P())
        return jax.jit(
            kernel,
            in_shardings=(None, tile, tile, tile, repl, repl),
            out_shardings=(None, repl),
        )


def render_batch(scene: CompiledScene, cfg: RayConfig, origin, direction, key,
                 weight=None, differentiable=False):
    """Trace a ray batch and return the final RayState. The shared device
    entry point used by engines, the bench and the graft entry."""
    state = init_rays(origin, direction, scene.bins, weight,
                      spectral_dtype=cfg.spectral_dtype)
    tracer = trace_rays_diff if differentiable else trace_rays
    return tracer(scene, cfg, state, key)


def render_loss_and_grads(scene: CompiledScene, cfg: RayConfig, origin,
                          direction, key, target):
    """Differentiable-rendering training step: L2 loss between the traced
    per-ray spectra and a target, with gradients w.r.t. every scene
    parameter (geometry transforms, primitive params, material spectra).

    Under a sharded jit, XLA all-reduces the scene-parameter gradients
    across the ray axis automatically (BASELINE north star).
    """

    def loss_fn(scene):
        final = render_batch(
            scene, cfg, origin, direction, key, differentiable=True
        )
        return jnp.mean((final.radiance - target) ** 2)

    # allow_int: integer tables (entity/material ids) get symbolic-zero
    # gradients; the float leaves (transforms, params, spectra) are the
    # differentiable scene parameters
    return jax.value_and_grad(loss_fn, allow_int=True)(scene)


class RenderEngine:
    """Render-engine strategy contract (reference core/workflow.py:35-97).

    The reference farms picklable (task, render, update) triples to worker
    processes; here engines orchestrate device work instead — observers
    consult ``worker_count()`` for tile sizing and engines may shard the
    tile kernel over a device mesh.
    """

    def run(self, tasks, render, update, render_args=(), update_args=()):
        raise NotImplementedError

    def worker_count(self):
        raise NotImplementedError


class SerialEngine(RenderEngine):
    """In-order host loop (reference core/workflow.py:100-120): debugging
    aid and the semantics reference for engine implementations."""

    def run(self, tasks, render, update, render_args=(), update_args=()):
        for task in tasks:
            update(render(task, *render_args), *update_args)

    def worker_count(self):
        return 1


class MulticoreEngine(ShardedEngine, RenderEngine):
    """Name-parity alias for the reference's default engine
    (core/workflow.py:123): on TPU the "cores" are mesh devices and the
    task farm is the sharded tile kernel; the serial ``run`` contract is
    honoured for host-side task lists."""

    def run(self, tasks, render, update, render_args=(), update_args=()):
        for task in tasks:
            update(render(task, *render_args), *update_args)

    def worker_count(self):
        return self.n_devices
