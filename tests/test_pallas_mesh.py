"""Pallas packet-traversal kernel vs the XLA per-lane traversal.

The TPU dispatch (meshtrace.mesh_intersect) only routes to the Pallas
kernel on real TPU; here the kernel runs in interpreter mode and must
agree exactly with the XLA expression on every field."""

import numpy as np

import jax
import jax.numpy as jnp

from source_tpu.tracer.meshtrace import _mesh_intersect_xla
from source_tpu.tracer.pallas_mesh import mesh_intersect_pallas_fwd_impl


def _icosphere_tables():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from demos.mesh_render import icosphere
    from source_tpu.primitive.mesh import MeshData

    verts, tris = icosphere(subdivisions=2, radius=1.0)
    data = MeshData(verts, tris, smoothing=True)
    eye = np.eye(4, dtype=np.float32)
    return data.to_tables(eye, eye)


def test_packet_kernel_matches_xla():
    mesh = _icosphere_tables()
    assert mesh.packed is not None

    n = 512
    rng = np.random.default_rng(3)
    # mix of hitting rays (aimed at the sphere) and missing rays
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
    target = rng.uniform(-0.8, 0.8, (n, 3))
    d = jnp.asarray(target - np.asarray(o), jnp.float32)
    d = d.at[::7].set(jnp.asarray(rng.normal(size=(len(range(0, n, 7))), ) [..., None] * 0 + rng.normal(size=(len(range(0, n, 7)), 3)), jnp.float32))
    t_min = jnp.full((n,), 1e-4, jnp.float32)

    ref = _mesh_intersect_xla(mesh, o, d, t_min)
    got = mesh_intersect_pallas_fwd_impl(mesh, o, d, t_min)

    hit_ref = np.asarray(ref["tri"] >= 0)
    hit_got = np.asarray(got["tri"] >= 0)
    np.testing.assert_array_equal(hit_got, hit_ref)
    m = hit_ref
    np.testing.assert_allclose(np.asarray(got["t"])[m], np.asarray(ref["t"])[m],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got["tri"])[m], np.asarray(ref["tri"])[m])
    np.testing.assert_allclose(np.asarray(got["u"])[m], np.asarray(ref["u"])[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["v"])[m], np.asarray(ref["v"])[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["front"])[m], np.asarray(ref["front"])[m])
    assert hit_ref.sum() > 50  # the batch genuinely exercises hits


def test_packet_gradients_match_finite_differences():
    """The winners-based custom VJP must match central finite differences of
    the (pallas) forward. Also covers _mesh_intersect_xla_diff, which shares
    the same backward."""
    from source_tpu.tracer.meshtrace import (
        _mesh_intersect_packet, _mesh_intersect_xla_diff,
    )

    mesh = _icosphere_tables()
    n = 16
    rng = np.random.default_rng(5)
    o_np = np.concatenate(
        [rng.uniform(-0.3, 0.3, (n, 2)), np.full((n, 1), -2.5)], axis=1
    ).astype(np.float32)
    d = jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)), jnp.float32)
    t_min = jnp.full((n,), 1e-4, jnp.float32)

    def loss(fn, o):
        r = fn(mesh, jnp.asarray(o), d, t_min)
        return jnp.sum(jnp.where(r["tri"] >= 0, r["t"], 0.0))

    for fn in (_mesh_intersect_packet, _mesh_intersect_xla_diff):
        g = np.asarray(jax.grad(lambda o: loss(fn, o))(jnp.asarray(o_np)))
        # central differences on a few coordinates
        eps = 1e-3
        for (i, c) in [(0, 0), (3, 2), (7, 1)]:
            op = o_np.copy(); op[i, c] += eps
            om = o_np.copy(); om[i, c] -= eps
            fd = (float(loss(fn, op)) - float(loss(fn, om))) / (2 * eps)
            assert abs(g[i, c] - fd) < 5e-2 * max(1.0, abs(fd)), (
                fn.__name__, i, c, g[i, c], fd)
