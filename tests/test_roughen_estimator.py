"""Quantify the Roughen modifier's estimator divergence (VERDICT r2 weak #8).

The reference rejection-samples the perturbed normal until it faces the
incident side (roughen.pyx:46-120); this port clamps invalid perturbations
back to the shading normal (wavefront.py). The two distributions differ in
the rejected tail; these tests measure the divergence of the outgoing-
direction distribution end-to-end and pin it below documented bounds."""

import numpy as np

import jax
import jax.numpy as jnp

from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.math.vector import Point3D
from source_tpu.core.scenegraph import World
from source_tpu.optical.material import PerfectReflectingSurface, Roughen
from source_tpu.primitive import Box
from source_tpu.tracer.wavefront import RayConfig, init_rays, trace_step


def _outgoing(roughness, n_rays=1 << 15, seed=5):
    """Trace one bounce off a roughened mirror plane z=1 (normal -z),
    incident at 45 degrees; return outgoing directions [N, 3]."""
    w = World()
    Box(lower=Point3D(-100.0, -100.0, 1.0), upper=Point3D(100.0, 100.0, 2.0),
        parent=w, material=Roughen(PerfectReflectingSurface(), roughness))
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 2))
    cfg = RayConfig(max_depth=4, extinction_prob=0.0, max_iters=4,
                    importance_sampling=False)
    th = np.pi / 4
    d = jnp.broadcast_to(
        jnp.asarray([np.sin(th), 0.0, np.cos(th)], jnp.float32), (n_rays, 3))
    state = init_rays(jnp.zeros((n_rays, 3)), d, scene.bins)
    nxt = trace_step(scene, cfg, state, jax.random.PRNGKey(seed))
    out = np.asarray(nxt.direction)
    alive = np.asarray(nxt.alive)
    return out[alive]


def _reference_outgoing(roughness, n_rays=1 << 15, seed=5):
    """Clean-room host model of the reference estimator
    (roughen.pyx:99-120): rejection-sample the perturbed normal (up to 50
    attempts) until the incident ray stays on the same side —
    sign(d.n) == sign(d.n_pert) — falling back to the unperturbed normal,
    then mirror-reflect about the accepted normal."""
    rng = np.random.default_rng(seed)
    th = np.pi / 4
    d = np.asarray([np.sin(th), 0.0, np.cos(th)])
    n = np.asarray([0.0, 0.0, -1.0])  # outward normal of the lower face
    out = np.zeros((n_rays, 3))
    # cosine-hemisphere samples in the normal frame (t, b, n)
    t = np.asarray([1.0, 0.0, 0.0])
    b = np.cross(n, t)
    for i in range(n_rays):
        accepted = n
        for _ in range(50):
            u1, u2 = rng.random(2)
            r = np.sqrt(u1)
            phi = 2 * np.pi * u2
            s = (r * np.cos(phi)) * t + (r * np.sin(phi)) * b + np.sqrt(1 - u1) * n
            npert = (1 - roughness) * n + roughness * s
            npert = npert / np.linalg.norm(npert)
            if np.dot(d, n) * np.dot(d, npert) > 0:
                accepted = npert
                break
        out[i] = d - 2 * np.dot(d, accepted) * accepted
    return out


def test_roughen_divergence_quantified():
    """Mean outgoing direction of the clamped estimator vs the reference
    rejection estimator: divergence < 0.03 (L2 of mean vectors) at
    roughness 0.5 and < 0.08 at roughness 1.0 — the documented bound for
    the deliberate clamping substitution."""
    for roughness, bound in ((0.5, 0.03), (1.0, 0.08)):
        ours = _outgoing(roughness)
        ref = _reference_outgoing(roughness, n_rays=1 << 13)
        gap = np.linalg.norm(ours.mean(axis=0) - ref.mean(axis=0))
        assert gap < bound, (roughness, gap, ours.mean(0), ref.mean(0))


def test_roughen_low_roughness_matches_specular():
    """As roughness -> 0 both estimators collapse to the mirror direction."""
    out = _outgoing(0.02)
    th = np.pi / 4
    specular = np.asarray([np.sin(th), 0.0, -np.cos(th)])
    mean = out.mean(axis=0)
    assert np.linalg.norm(mean - specular) < 0.02, mean
