"""Material modifiers, debug materials, inhomogeneous volume emitters."""

import numpy as np

import jax
import jax.numpy as jnp

from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.math.vector import Point3D
from source_tpu.core.scenegraph import World
from source_tpu.optical.material import (
    Add, Blend, Conductor, Lambert, Light, NumericalIntegrator,
    InhomogeneousVolumeEmitter, PerfectReflectingSurface, Roughen,
    UniformSurfaceEmitter, UnitySurfaceEmitter, VolumeTransform,
)
from source_tpu.optical.spectrum import ConstantSF
from source_tpu.parallel.engine import render_batch
from source_tpu.primitive import Box, Sphere
from source_tpu.tracer.wavefront import RayConfig


def _cfg(**kw):
    base = dict(max_depth=6, extinction_prob=0.0, max_iters=8,
                importance_sampling=False)
    base.update(kw)
    return RayConfig(**base)


def _rays(n, key=0):
    d = jax.random.normal(jax.random.PRNGKey(key), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.zeros((n, 3)), d


def test_blend_mixes_emitters():
    w = World()
    a = UniformSurfaceEmitter(ConstantSF(1.0))
    b = UniformSurfaceEmitter(ConstantSF(3.0))
    Sphere(radius=5.0, parent=w, material=Blend(a, b, 0.5))
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    o, d = _rays(4096)
    out = render_batch(scene, _cfg(), o, d, jax.random.PRNGKey(1))
    r = np.asarray(out.radiance)
    # every sample is exactly 1 or 3; the mean converges to 2
    assert set(np.round(np.unique(r), 4)).issubset({1.0, 3.0})
    assert abs(r.mean() - 2.0) < 0.1


def test_add_sums_emitters():
    w = World()
    a = UniformSurfaceEmitter(ConstantSF(1.0))
    b = UniformSurfaceEmitter(ConstantSF(1.0))
    Sphere(radius=5.0, parent=w, material=Add(a, b))
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    o, d = _rays(256)
    out = render_batch(scene, _cfg(), o, d, jax.random.PRNGKey(1))
    r = np.asarray(out.radiance)
    # both children emit 1 -> every doubled sample is exactly 2 = 1+1
    assert np.allclose(r, 2.0, atol=1e-4)


def test_perfect_mirror_furnace():
    """Mirror box inside an emitting sphere: rays bounce then reach the
    emitter, radiance stays exactly 1 (lossless)."""
    w = World()
    Sphere(radius=5.0, parent=w, material=UnitySurfaceEmitter())
    Box(lower=Point3D(-0.5, -0.5, 2.0), upper=Point3D(0.5, 0.5, 2.5),
        parent=w, material=PerfectReflectingSurface())
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    o = jnp.zeros((8, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (8, 3))  # hits mirror
    out = render_batch(scene, _cfg(), o, d, jax.random.PRNGKey(1))
    assert np.allclose(np.asarray(out.radiance), 1.0, atol=1e-4)


def test_light_directional():
    w = World()
    Box(lower=Point3D(-5, -5, 1), upper=Point3D(5, 5, 2), parent=w,
        material=Light((0.0, 0.0, 1.0), intensity=2.0, spectrum=ConstantSF(1.0)))
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    o = jnp.zeros((4, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4, 3))
    out = render_batch(scene, _cfg(), o, d, jax.random.PRNGKey(1))
    # light shines along +z onto the z=1 face (outward normal -z):
    # factor = max(0, -l.n) = 1 -> radiance = intensity = 2
    assert np.allclose(np.asarray(out.radiance), 2.0, atol=1e-4)


def test_roughen_render_finite():
    w = World()
    Sphere(radius=5.0, parent=w, material=UnitySurfaceEmitter())
    Box(lower=Point3D(-1, -1, 2), upper=Point3D(1, 1, 2.5), parent=w,
        material=Roughen(Conductor(ConstantSF(1.5), ConstantSF(3.0)), 0.5))
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    assert scene.has_roughen
    o = jnp.zeros((512, 3))
    d = jax.random.normal(jax.random.PRNGKey(2), (512, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = render_batch(scene, _cfg(), o, d, jax.random.PRNGKey(3))
    r = np.asarray(out.radiance)
    assert np.isfinite(r).all() and r.max() > 0.5


def test_inhomogeneous_volume_emitter_analytic():
    """Constant-density closure in a sphere observed from the centre:
    radiance = density * radius exactly (midpoint rule is exact here)."""
    def emission(p_local, d_local, lam):
        return jnp.ones(p_local.shape[:-1] + (lam.shape[0],))

    w = World()
    Sphere(radius=2.0, parent=w,
           material=InhomogeneousVolumeEmitter(emission, NumericalIntegrator(max_samples=8)))
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    o, d = _rays(64)
    out = render_batch(scene, _cfg(), o, d, jax.random.PRNGKey(1))
    assert np.allclose(np.asarray(out.radiance), 2.0, atol=1e-3)


def test_inhomogeneous_spatial_profile():
    """Linear density rho(z) = max(0, z) inside a unit sphere: along +z from
    centre the integral is z^2/2 = 0.5; along -z it is 0."""
    def emission(p_local, d_local, lam):
        rho = jnp.maximum(p_local[..., 2], 0.0)
        return jnp.broadcast_to(rho[..., None], rho.shape + (lam.shape[0],))

    w = World()
    Sphere(radius=1.0, parent=w,
           material=InhomogeneousVolumeEmitter(emission, NumericalIntegrator(max_samples=64)))
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    o = jnp.zeros((2, 3))
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    out = render_batch(scene, _cfg(), o, d, jax.random.PRNGKey(1))
    r = np.asarray(out.radiance)
    assert np.allclose(r[0], 0.5, atol=5e-3)
    assert np.allclose(r[1], 0.0, atol=1e-5)


def test_volume_transform_offsets_frame():
    """VolumeTransform shifts the emission profile: translate the z-profile
    by +0.5 so the -z ray now sees the density."""
    from source_tpu.core.math.transform import translate

    def emission(p_local, d_local, lam):
        rho = jnp.maximum(p_local[..., 2], 0.0)
        return jnp.broadcast_to(rho[..., None], rho.shape + (lam.shape[0],))

    w = World()
    inner = InhomogeneousVolumeEmitter(emission, NumericalIntegrator(max_samples=64))
    Sphere(radius=1.0, parent=w,
           material=VolumeTransform(inner, translate(0.0, 0.0, -0.5)))
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    out = render_batch(scene, _cfg(), o, d, jax.random.PRNGKey(1))
    # local frame shifted: rho(p) = max(0, z + 0.5); along -z from 0 to -1:
    # integral of max(0, 0.5 - s) ds over [0,1] = 0.125
    assert np.allclose(np.asarray(out.radiance), 0.125, atol=5e-3)
