"""Large-mesh paging: meshes whose packed tables exceed the Pallas VMEM
budget traverse per-page private BVHs (pallas_mesh.pack_mesh_paged_host)
with identical results to the single-table path (VERDICT round-1 item 4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from source_tpu.primitive.mesh.data import MeshData
from source_tpu.tracer import pallas_mesh
from source_tpu.tracer.meshtrace import mesh_intersect, _mesh_intersect_xla


def _icosphere(subdiv=3, radius=1.0):
    t = (1.0 + 5.0 ** 0.5) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int32)
    for _ in range(subdiv):
        cache, new_faces = {}, []
        vl = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = vl[a] + vl[b]
                m /= np.linalg.norm(m)
                cache[key] = len(vl)
                vl.append(m)
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(vl)
        faces = np.asarray(new_faces, np.int32)
    return (verts * radius).astype(np.float32), faces


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to([0.0, 0.0, -3.0], (n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d, jnp.float32), jnp.zeros(n, jnp.float32)


def _paged_tables(data):
    """Force the paged packing regardless of table size."""
    tables = data.to_tables(np.eye(4), np.eye(4))
    stacked, metas = pallas_mesh.pack_mesh_paged_host(
        data.vertices, data.triangles, max_leaf=data.max_leaf,
        page_limit=8 * 1024,  # tiny pages -> many of them
    )
    assert stacked is not None and metas[0] > 1
    stacked = {k: jnp.asarray(v) for k, v in stacked.items()}
    return dataclasses.replace(tables, packed=stacked, page_meta=metas)


def test_paged_matches_single_table():
    v, f = _icosphere(3, radius=1.0)
    data = MeshData(v, f, smoothing=False, closed=True)
    mesh = _paged_tables(data)
    o, d, tmin = _rays(512)

    ref = _mesh_intersect_xla(data.to_tables(np.eye(4), np.eye(4)), o, d, tmin)
    got = pallas_mesh.mesh_intersect_pallas_paged_impl(mesh, o, d, tmin)

    hit_ref = np.asarray(ref["tri"]) >= 0
    hit_got = np.asarray(got["tri"]) >= 0
    np.testing.assert_array_equal(hit_ref, hit_got)
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit_got], np.asarray(ref["t"])[hit_ref],
        rtol=1e-5, atol=1e-6,
    )
    # winners agree (global BVH-order triangle ids)
    np.testing.assert_array_equal(
        np.asarray(got["tri"])[hit_got], np.asarray(ref["tri"])[hit_ref]
    )


def test_paged_dispatch_through_mesh_intersect(monkeypatch):
    """When packing overflows VMEM, to_tables pages the mesh and
    mesh_intersect routes through the paged kernel (interpret mode off-TPU)."""
    monkeypatch.setattr(pallas_mesh, "VMEM_TABLE_LIMIT", 8 * 1024)
    v, f = _icosphere(2, radius=1.0)
    data = MeshData(v, f, smoothing=False, closed=True)
    tables = data.to_tables(np.eye(4), np.eye(4))
    assert tables.page_meta, "expected the paged packing to engage"
    assert isinstance(tables.packed, dict) and "meta" in tables.packed
    o, d, tmin = _rays(256, seed=3)
    ref = _mesh_intersect_xla(tables, o, d, tmin)
    got = pallas_mesh.mesh_intersect_pallas_paged_impl(tables, o, d, tmin)
    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(ref["tri"]))


def test_paged_gradients_flow():
    """custom_vjp backward recomputes from the GLOBAL winner id, so paging
    preserves vertex gradients."""
    v, f = _icosphere(3, radius=1.0)
    data = MeshData(v, f, smoothing=False, closed=True)
    mesh = _paged_tables(data)
    o, d, tmin = _rays(64, seed=5)

    from source_tpu.tracer.meshtrace import _mesh_intersect_packet

    def loss(mesh):
        out = _mesh_intersect_packet(mesh, o, d, tmin)
        t = out["t"]
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    g = jax.grad(lambda m: loss(m), allow_int=True)(mesh)
    gv = np.asarray(g.vertices)
    assert np.isfinite(gv).all()
    assert np.abs(gv).sum() > 0.0
