"""Lens primitives: geometry + paraxial focal-length physics validation."""

import numpy as np

import jax
import jax.numpy as jnp

from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.scenegraph import World
from source_tpu.optical.material import Dielectric, Lambert
from source_tpu.optical.spectrum import ConstantSF
from source_tpu.primitive import (
    BiConcave, BiConvex, EncapsulatedPrimitive, Meniscus, PlanoConcave,
    PlanoConvex, Sphere,
)
from source_tpu.tracer.intersect import entity_contains, intersect_scene
from source_tpu.tracer.wavefront import RayConfig, init_rays, trace_rays


def test_lens_construction_and_contains():
    lenses = [
        BiConvex(0.02, 0.006, 0.05, 0.05),
        BiConcave(0.02, 0.003, 0.05, 0.05),
        PlanoConvex(0.02, 0.005, 0.05),
        PlanoConcave(0.02, 0.003, 0.05),
        Meniscus(0.02, 0.004, 0.05, 0.1),
    ]
    for lens in lenses:
        w = World()
        lens.material = Lambert()
        lens.parent = w
        scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
        # a point on the axis inside the body is contained
        mid = 0.5 * lens.center_thickness
        pts = jnp.asarray(
            [[0.0, 0.0, mid], [0.0, 0.0, -1.0], [0.015, 0.0, mid]]
        )
        inside = np.asarray(entity_contains(scene, pts))[:, 0]
        assert inside[0], type(lens).__name__
        assert not inside[1] and not inside[2], type(lens).__name__
        lens.parent = None

    # invalid geometry rejected (spherical.pyx validation)
    try:
        BiConvex(0.02, 0.001, 0.05, 0.05)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_biconvex_hit_surfaces():
    w = World()
    BiConvex(0.02, 0.006, 0.05, 0.05, parent=w, material=Lambert())
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    o = jnp.asarray([[0.0, 0.0, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    rec = intersect_scene(scene, o, d)
    # back surface vertex is at z = 0 -> t = 1
    assert abs(float(rec.t[0]) - 1.0) < 1e-4
    n = np.asarray(rec.normal)[0]
    assert n[2] < -0.99  # outward normal opposes the incoming ray


def test_biconvex_focal_length():
    """Paraxial rays through an f=51mm biconvex lens (n=1.5, R=50mm, d=6mm)
    cross the axis at the lensmaker back focal distance."""
    n_glass = 1.5
    R = 0.05
    d_thick = 0.006
    w = World()
    BiConvex(0.02, d_thick, R, R, parent=w,
             material=Dielectric(ConstantSF(n_glass), ConstantSF(1.0),
                                 transmission_only=True))
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    cfg = RayConfig(max_depth=8, extinction_prob=0.0, max_iters=8,
                    importance_sampling=False)

    # parallel paraxial rays at small radial offsets
    hs = np.asarray([0.002, 0.003, -0.0025])
    o = jnp.asarray([[h, 0.0, -0.05] for h in hs])
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (3, 3))
    state = init_rays(o, d, scene.bins)
    final = trace_rays(scene, cfg, state, jax.random.PRNGKey(0))

    # escaped rays carry their exit origin/direction; find axis crossing
    oo = np.asarray(final.origin)
    dd = np.asarray(final.direction)
    t_cross = -oo[:, 0] / dd[:, 0]
    z_cross = oo[:, 2] + t_cross * dd[:, 2]

    # lensmaker: 1/f = (n-1)(2/R - (n-1)d/(n R^2)); BFD from front vertex
    f = 1.0 / ((n_glass - 1) * (2.0 / R - (n_glass - 1) * d_thick / (n_glass * R * R)))
    bfd = f * (1.0 - (n_glass - 1) * d_thick / (n_glass * R))
    expect = d_thick + bfd
    assert np.allclose(z_cross, expect, atol=0.002), (z_cross, expect)


def test_encapsulated_primitive_delegates():
    inner = Sphere(radius=0.5)
    wrapped = EncapsulatedPrimitive(inner, material=Lambert())
    w = World()
    wrapped.parent = w
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    rec = intersect_scene(scene, o, d)
    assert abs(float(rec.t[0]) - 1.5) < 1e-4
    inst = wrapped.instance()
    assert inst.primitive is inner
