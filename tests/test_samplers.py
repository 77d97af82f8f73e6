"""Sampler classes: distribution means, pdf normalisation (MC checks)."""

import numpy as np

import jax
import jax.numpy as jnp

from source_tpu.core.math.sampler import (
    ConeUniformSampler, DiskSampler3D, HemisphereCosineSampler,
    HemisphereUniformSampler, RectangleSampler3D, SphereSampler,
    TargetedSphereSampler, TargetedHemisphereSampler, TriangleSampler3D,
)


def _mc_pdf_integral(sampler, n=20000, key=0):
    """MC estimate of integral of pdf over the sphere using uniform dirs."""
    s = SphereSampler()
    d = s.sample(jax.random.PRNGKey(key), n)
    pdf = np.asarray(sampler.pdf(d))
    return pdf.mean() * 4.0 * np.pi


def test_solidangle_pdf_normalisation():
    for sampler in [
        SphereSampler(), HemisphereUniformSampler(), HemisphereCosineSampler(),
        ConeUniformSampler(30.0),
    ]:
        integral = _mc_pdf_integral(sampler)
        assert abs(integral - 1.0) < 0.05, (type(sampler).__name__, integral)


def test_sampler_self_consistency():
    """E[1/pdf(X)] over samples X ~ pdf equals the support's solid angle."""
    key = jax.random.PRNGKey(1)
    for sampler, sa in [
        (SphereSampler(), 4 * np.pi),
        (HemisphereUniformSampler(), 2 * np.pi),
        (ConeUniformSampler(45.0), 2 * np.pi * (1 - np.cos(np.deg2rad(45)))),
    ]:
        d, pdf = sampler.samples_with_pdfs(key, 20000)
        est = float(np.mean(1.0 / np.asarray(pdf)))
        assert abs(est - sa) / sa < 0.02, (type(sampler).__name__, est, sa)


def test_cosine_sampler_mean_z():
    d = HemisphereCosineSampler().sample(jax.random.PRNGKey(2), 20000)
    # E[z] for cosine-weighted = 2/3
    assert abs(float(jnp.mean(d[:, 2])) - 2.0 / 3.0) < 0.01


def test_surface_samplers():
    key = jax.random.PRNGKey(3)
    disk = DiskSampler3D(2.0)
    p = np.asarray(disk.sample(key, 5000))
    assert (np.linalg.norm(p[:, :2], axis=1) <= 2.0 + 1e-6).all()
    assert np.allclose(p[:, 2], 0.0)
    assert abs(disk.area - np.pi * 4) < 1e-6

    rect = RectangleSampler3D(2.0, 1.0)
    p = np.asarray(rect.sample(key, 5000))
    assert (np.abs(p[:, 0]) <= 1.0 + 1e-6).all() and (np.abs(p[:, 1]) <= 0.5 + 1e-6).all()

    tri = TriangleSampler3D((0, 0, 0), (1, 0, 0), (0, 1, 0))
    p = np.asarray(tri.sample(key, 5000))
    assert (p[:, 0] >= -1e-6).all() and (p[:, 1] >= -1e-6).all()
    assert (p[:, 0] + p[:, 1] <= 1 + 1e-5).all()
    assert abs(tri.area - 0.5) < 1e-6
    # uniform triangle centroid = (1/3, 1/3)
    assert np.allclose(p.mean(axis=0)[:2], [1 / 3, 1 / 3], atol=0.02)


def test_targeted_sphere_sampler():
    t = TargetedSphereSampler(
        [((0.0, 0.0, 5.0), 1.0, 1.0)], origin=(0.0, 0.0, 0.0)
    )
    d = np.asarray(t.sample(jax.random.PRNGKey(4), 4000))
    # most samples point at the target (+z cone)
    frac_up = (d[:, 2] > 0.9).mean()
    assert frac_up > 0.8
    # pdf integrates to ~1 over the sphere
    integral = _mc_pdf_integral(t, n=100000)
    assert abs(integral - 1.0) < 0.05, integral


def test_targeted_hemisphere_zero_below_horizon():
    t = TargetedHemisphereSampler(
        [((0.0, 0.0, 5.0), 1.0, 1.0)], origin=(0.0, 0.0, 0.0)
    )
    down = jnp.asarray([[0.0, 0.0, -1.0]])
    assert float(t.pdf(down)[0]) == 0.0
