"""Fused bounce megakernel parity (tracer/pallas_fused.py).

The fused per-bounce Pallas kernel must reproduce the XLA wavefront path
estimator-exactly: same RNG stream, same discrete decisions, same
per-lane radiance, and (through the custom_vjp span: in-kernel state
cotangents + batched table vjp) the same gradients w.r.t. every scene
table. Reference analogue: the recursive trace loop
(raysect/optical/ray.pyx:338-455) whose estimator both paths implement.

Runs the kernels in interpret mode on CPU via SOURCE_TPU_FUSED=1.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from demos.cornell_box import build_world
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.math.transform import rotate_x, rotate_y, translate
from source_tpu.core.math.vector import Point3D, Vector3D
from source_tpu.core.scenegraph.node import World
from source_tpu.optical import InterpolatedSF
from source_tpu.optical.material import (
    AbsorbingSurface, AnisotropicSurfaceEmitter, Checkerboard, Conductor,
    Lambert, NullSurface, PerfectReflectingSurface, RoughConductor,
    UniformSurfaceEmitter, UniformVolumeEmitter,
)
from source_tpu.parallel.engine import render_loss_and_grads
from source_tpu.tracer.pallas_fused import fused_spec
from source_tpu.tracer.wavefront import RayConfig, init_rays, trace_rays, trace_rays_diff

B = 5


def _rays(n=512, seed=0):
    rng = np.random.RandomState(seed)
    o = jnp.asarray(
        np.concatenate(
            [rng.uniform(-0.9, 0.9, (n, 2)), np.full((n, 1), -2.5)], axis=1
        ),
        jnp.float32,
    )
    d = rng.normal(size=(n, 3)) + np.array([0, 0, 4.0])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d, jnp.float32)


@pytest.fixture(scope="module")
def cornell():
    return compile_scene(build_world(glass=True), SpectralConfig(375.0, 740.0, B))


@pytest.fixture(scope="module")
def zoo():
    """Every other supported material type in one scene."""
    w = World()
    ns = InterpolatedSF([400, 700], [1.2, 1.1])
    ks = InterpolatedSF([400, 700], [5.0, 4.0])
    spec = InterpolatedSF([400, 700], [1.0, 3.0])
    mats = [
        Conductor(ns, ks),
        RoughConductor(ns, ks, 0.3),
        AnisotropicSurfaceEmitter(spec, 1.0, 2.0),
        Checkerboard(0.3, spec, InterpolatedSF([400, 700], [3.0, 1.0]), 1.0),
        PerfectReflectingSurface(),
        NullSurface(),
        AbsorbingSurface(),
        UniformVolumeEmitter(spec, 0.7),
        Lambert(InterpolatedSF([400, 700], [0.4, 0.6])),
    ]
    from source_tpu.primitive import Box, Cone, Cylinder, Parabola, Sphere

    rng = np.random.RandomState(5)
    for i, mat in enumerate(mats):
        x, y, z = rng.uniform(-2.0, 2.0, 3)
        t = translate(x, y, z) * rotate_x(float(rng.uniform(0, 90)))
        kind = i % 5
        if kind == 0:
            Sphere(0.5, parent=w, transform=t, material=mat)
        elif kind == 1:
            Box(Point3D(-0.4, -0.3, -0.2), Point3D(0.4, 0.3, 0.2),
                parent=w, transform=t, material=mat)
        elif kind == 2:
            Cylinder(0.35, 0.7, parent=w, transform=t, material=mat)
        elif kind == 3:
            Cone(0.35, 0.6, parent=w, transform=t, material=mat)
        else:
            Parabola(0.35, 0.5, parent=w, transform=t, material=mat)
    # torus: the quartic leaf joins the fused kernel's inline types
    # (VERDICT r4 next #5)
    from source_tpu.primitive import Torus

    Torus(0.8, 0.25, parent=w,
          transform=translate(0.0, -1.2, 1.0) * rotate_x(30.0),
          material=Lambert(InterpolatedSF([400, 700], [0.5, 0.5])))
    # an emitter so paths can terminate with radiance
    Box(Point3D(-3, -3, 4.0), Point3D(3, 3, 4.1), parent=w,
        material=UniformSurfaceEmitter(spec, 2.0))
    return compile_scene(w, SpectralConfig(375.0, 740.0, B))


def _cfg(**kw):
    base = dict(max_depth=6, extinction_prob=0.1, extinction_min_depth=3,
                importance_sampling=True, important_path_weight=0.25,
                max_iters=8, compact_schedule=(), early_exit=False)
    base.update(kw)
    return RayConfig(**base)


def _ab(env, fn):
    prev = os.environ.get("SOURCE_TPU_FUSED")
    os.environ["SOURCE_TPU_FUSED"] = env
    try:
        return fn()
    finally:
        if prev is None:
            os.environ.pop("SOURCE_TPU_FUSED", None)
        else:
            os.environ["SOURCE_TPU_FUSED"] = prev


def test_spec_eligibility(cornell):
    cfg = _cfg()
    spec = fused_spec(cornell, cfg)
    assert spec is not None
    assert len(spec.leaves) == cornell.n_leaves
    assert spec.volumes  # the two glass Beer-Lambert volumes
    # CSG scenes are ineligible
    from source_tpu.primitive import Box, Sphere
    from source_tpu.primitive.csg import Subtract

    w = World()
    Subtract(Sphere(0.5), Box(Point3D(0, -1, -1), Point3D(1, 1, 1)),
             parent=w, material=Lambert())
    csg_scene = compile_scene(w, SpectralConfig(400.0, 700.0, 4))
    assert fused_spec(csg_scene, cfg) is None


@pytest.mark.parametrize("scene_name", ["cornell", "zoo"])
def test_forward_parity(scene_name, cornell, zoo):
    scene = {"cornell": cornell, "zoo": zoo}[scene_name]
    cfg = _cfg()
    assert fused_spec(scene, cfg) is not None
    o, d = _rays()
    key = jax.random.PRNGKey(7)
    st = init_rays(o, d, B)
    ref = _ab("0", lambda: trace_rays(scene, cfg, st, key))
    got = _ab("1", lambda: trace_rays(scene, cfg, st, key))
    assert int(ref.segments) == int(got.segments)
    np.testing.assert_array_equal(np.asarray(ref.alive), np.asarray(got.alive))
    np.testing.assert_array_equal(np.asarray(ref.depth), np.asarray(got.depth))
    np.testing.assert_allclose(
        np.asarray(got.radiance), np.asarray(ref.radiance),
        rtol=1e-3, atol=1e-4)


def test_forward_parity_compacted(cornell):
    """Compaction stages + early-exit while loop around the fused spans."""
    cfg = _cfg(compact_schedule=((3, 2), (2, 2)), early_exit=True)
    o, d = _rays(384, seed=3)
    key = jax.random.PRNGKey(3)
    st = init_rays(o, d, B)
    ref = _ab("0", lambda: trace_rays(cornell, cfg, st, key))
    got = _ab("1", lambda: trace_rays(cornell, cfg, st, key))
    assert int(ref.segments) == int(got.segments)
    np.testing.assert_allclose(
        np.asarray(got.radiance), np.asarray(ref.radiance),
        rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("span", ["perbounce", "multi"])
def test_diff_trace_parity(span, cornell, monkeypatch):
    """trace_rays_diff through the fused span matches the XLA scan —
    for both diff-span kernel flavours (per-bounce is the measured-faster
    default; multi is the whole-span VMEM-resident kernel)."""
    monkeypatch.setenv("SOURCE_TPU_SPAN_DIFF", span)
    cfg = _cfg(compact_schedule=((4, 2),))
    o, d = _rays(256, seed=1)
    key = jax.random.PRNGKey(11)
    st = init_rays(o, d, B)
    ref = _ab("0", lambda: trace_rays_diff(cornell, cfg, st, key))
    got = _ab("1", lambda: trace_rays_diff(cornell, cfg, st, key))
    assert int(ref.segments) == int(got.segments)
    np.testing.assert_allclose(
        np.asarray(got.radiance), np.asarray(ref.radiance),
        rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("scene_name,span", [
    ("cornell", "perbounce"), ("cornell", "multi"), ("zoo", "multi")])
def test_gradient_parity(scene_name, span, cornell, zoo, monkeypatch):
    """Scene-table cotangents from the hand-structured backward (in-kernel
    state-cotangent chain + in-kernel table cotangents) match XLA autodiff
    — for both diff-span kernel flavours (zoo on multi: the scene that
    caught the all-dead-tile bits=0 NaN and the torus quartic guard)."""
    monkeypatch.setenv("SOURCE_TPU_SPAN_DIFF", span)
    scene = {"cornell": cornell, "zoo": zoo}[scene_name]
    cfg = _cfg(compact_schedule=((4, 2),))
    o, d = _rays(256, seed=2)
    key = jax.random.PRNGKey(13)
    target = jnp.zeros((256, B), jnp.float32)
    loss_ref, g_ref = _ab(
        "0", lambda: render_loss_and_grads(scene, cfg, o, d, key, target))
    loss_got, g_got = _ab(
        "1", lambda: render_loss_and_grads(scene, cfg, o, d, key, target))
    np.testing.assert_allclose(float(loss_got), float(loss_ref), rtol=1e-5)
    for f in ["leaf_w2l", "leaf_params", "mat_params", "mat_spectra",
              "mat_scalars", "imp_centre", "imp_radius", "imp_weight",
              "imp_cdf", "entity_w2l"]:
        a = np.asarray(getattr(g_ref, f), np.float64)
        b = np.asarray(getattr(g_got, f), np.float64)
        assert np.isfinite(b).all(), f
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b / scale, a / scale, rtol=0, atol=2e-4,
                                   err_msg=f)
