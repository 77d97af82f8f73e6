"""Mesh subsystem tests: BVH build, traversal, scene integration, IO.

Mirrors the reference's testing idioms (SURVEY.md §4): analytic
closed-form scenes + behavioural checks.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _unit_cube_mesh(**kwargs):
    """Closed unit cube [-0.5, 0.5]^3 as 12 triangles (outward winding)."""
    from source_tpu.primitive import Mesh

    v = np.array(
        [
            [-0.5, -0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5], [-0.5, 0.5, -0.5],
            [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5],
        ],
        np.float32,
    )
    t = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # z = -0.5 (normal -z)
            [4, 5, 6], [4, 6, 7],  # z = +0.5 (normal +z)
            [0, 1, 5], [0, 5, 4],  # y = -0.5
            [2, 3, 7], [2, 7, 6],  # y = +0.5
            [0, 4, 7], [0, 7, 3],  # x = -0.5
            [1, 2, 6], [1, 6, 5],  # x = +0.5
        ],
        np.int32,
    )
    return Mesh(v, t, smoothing=False, closed=True, **kwargs)


def test_bvh_invariants():
    from source_tpu.accel.bvh import build_bvh

    rng = np.random.default_rng(0)
    T = 500
    c = rng.uniform(-5, 5, (T, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.2, (T, 3)).astype(np.float32)
    bvh = build_bvh(c - h, c + h, max_leaf=4)
    seen = np.zeros(T, bool)
    for i in range(bvh.n_nodes):
        assert i < bvh.node_skip[i] <= bvh.n_nodes
        if bvh.node_count[i] > 0:
            ids = bvh.order[bvh.node_first[i]:bvh.node_first[i] + bvh.node_count[i]]
            assert not seen[ids].any()
            seen[ids] = True
    assert seen.all()


def test_mesh_traversal_vs_bruteforce():
    """BVH traversal t must match a brute-force all-triangles test."""
    from source_tpu.primitive.mesh import MeshData
    from source_tpu.tracer.meshtrace import mesh_intersect

    rng = np.random.default_rng(1)
    # random triangle cloud
    centres = rng.uniform(-2, 2, (200, 3)).astype(np.float32)
    verts = (centres[:, None, :] + 0.3 * rng.standard_normal((200, 3, 3)).astype(np.float32)).reshape(-1, 3)
    tris = np.arange(600, dtype=np.int32).reshape(200, 3)
    data = MeshData(verts, tris, smoothing=False)
    tables = data.to_tables(np.eye(4), np.eye(4))

    N = 64
    o = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    res = mesh_intersect(tables, jnp.asarray(o), jnp.asarray(d), jnp.full(N, 1e-4))

    # brute force over permuted triangles (same indexing as tables)
    v0 = data.vertices[data.triangles[:, 0]]
    v1 = data.vertices[data.triangles[:, 1]]
    v2 = data.vertices[data.triangles[:, 2]]
    e1, e2 = v1 - v0, v2 - v0
    t_best = np.full(N, np.inf)
    for i in range(N):
        p = np.cross(d[i], e2)
        det = (e1 * p).sum(-1)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = o[i] - v0
        u = (tv * p).sum(-1) * inv
        q = np.cross(tv, e1)
        vv = (d[i] * q).sum(-1) * inv
        tt = (e2 * q).sum(-1) * inv
        valid = ok & (u >= -1e-6) & (vv >= -1e-6) & (u + vv <= 1 + 1e-6) & (tt > 1e-4)
        if valid.any():
            t_best[i] = tt[valid].min()
    got = np.asarray(res["t"])
    miss = ~np.isfinite(t_best)
    assert np.all(~np.isfinite(got[miss]))
    assert np.allclose(got[~miss], t_best[~miss], rtol=1e-4, atol=1e-5)


def test_mesh_in_scene_hit_and_contains():
    from source_tpu.compiler import SpectralConfig, compile_scene
    from source_tpu.core.scenegraph import World
    from source_tpu.optical.material import Lambert
    from source_tpu.tracer.intersect import entity_contains, intersect_scene

    w = World()
    _unit_cube_mesh(parent=w, material=Lambert())
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))

    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.0, 0.0], [2.0, 2.0, 2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    rec = intersect_scene(scene, o, d)
    t = np.asarray(rec.t)
    assert abs(t[0] - 2.5) < 1e-3  # enters front face at z=-0.5
    assert abs(t[1] - 0.5) < 1e-3  # from centre exits at z=+0.5
    assert not bool(np.asarray(rec.hit)[2])  # misses
    # normals: entering -> normal opposes ray
    n = np.asarray(rec.normal)
    assert np.allclose(n[0], [0, 0, -1], atol=1e-4)
    assert bool(np.asarray(rec.exiting)[1])
    # containment parity
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0], [0.49, 0.49, 0.49]])
    inside = np.asarray(entity_contains(scene, pts))[:, 0]
    assert inside[0] and not inside[1] and inside[2]


def test_mesh_with_analytic_and_transform():
    """Mesh + sphere in one scene; mesh under a translation transform."""
    from source_tpu.compiler import SpectralConfig, compile_scene
    from source_tpu.core.math.transform import translate
    from source_tpu.core.scenegraph import World
    from source_tpu.optical.material import Lambert
    from source_tpu.primitive import Sphere
    from source_tpu.tracer.intersect import intersect_scene

    w = World()
    mesh = _unit_cube_mesh(parent=w, material=Lambert())
    mesh.transform = translate(2.0, 0.0, 0.0)
    Sphere(radius=0.5, parent=w, material=Lambert())
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))

    o = jnp.asarray([[2.0, 0.0, -3.0], [0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    rec = intersect_scene(scene, o, d)
    t = np.asarray(rec.t)
    assert abs(t[0] - 2.5) < 1e-3  # translated cube
    assert abs(t[1] - 2.5) < 1e-3  # sphere at origin


def test_mesh_instance_shares_data():
    from source_tpu.optical.material import Lambert

    m1 = _unit_cube_mesh(material=Lambert())
    m2 = m1.instance()
    assert m2.data is m1.data


def test_mesh_io_roundtrip(tmp_path):
    from source_tpu.primitive.mesh import (
        export_obj, export_ply, export_stl, export_vtk,
        import_obj, import_ply, import_stl, import_vtk,
    )

    mesh = _unit_cube_mesh()
    for export, imp, name in [
        (export_obj, import_obj, "m.obj"),
        (export_stl, import_stl, "m.stl"),
        (export_ply, import_ply, "m.ply"),
        (export_vtk, import_vtk, "m.vtk"),
    ]:
        path = os.path.join(tmp_path, name)
        export(mesh, path)
        back = imp(path)
        assert back.data.n_triangles == mesh.data.n_triangles
        # same geometry up to vertex order: compare sorted triangle centroids
        def centroids(m):
            d = m.data
            c = d.vertices[d.triangles].mean(axis=1)
            return np.sort(c.round(4).view([('x', 'f4'), ('y', 'f4'), ('z', 'f4')]), order=['x', 'y', 'z'], axis=0)
        assert np.allclose(
            centroids(back).view('f4').reshape(-1, 3),
            centroids(mesh).view('f4').reshape(-1, 3), atol=1e-4,
        )


def test_mesh_save_load_roundtrip(tmp_path):
    mesh = _unit_cube_mesh()
    path = os.path.join(tmp_path, "cube.npz")
    mesh.save(path)
    from source_tpu.primitive import Mesh

    back = Mesh.load(path)
    assert back.data.n_triangles == 12
    assert np.allclose(back.data.vertices, mesh.data.vertices)
    assert np.array_equal(back.data.bvh.node_skip, mesh.data.bvh.node_skip)


def test_mesh_render_unity_emitter():
    """Furnace-style: camera inside a closed emitting cube sees 1.0."""
    from source_tpu.compiler import SpectralConfig, compile_scene
    from source_tpu.core.scenegraph import World
    from source_tpu.optical.material import UnitySurfaceEmitter
    from source_tpu.parallel.engine import render_batch
    from source_tpu.tracer.wavefront import RayConfig

    w = World()
    _unit_cube_mesh(parent=w, material=UnitySurfaceEmitter())
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 4))
    cfg = RayConfig(max_depth=4, extinction_prob=0.0, max_iters=4)
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (128, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.zeros((128, 3))
    out = render_batch(scene, cfg, o, d, jax.random.PRNGKey(1))
    assert np.allclose(np.asarray(out.radiance), 1.0, atol=1e-4)


def test_rsm_round_trip(tmp_path):
    """import_rsm/export_rsm: the reference's binary mesh format
    (mesh.pyx:864-1046) round-trips geometry + flags."""
    import numpy as np

    from source_tpu.primitive.mesh import Mesh, export_rsm, import_rsm

    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    t = np.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    mesh = Mesh(v, t, smoothing=False, closed=True)
    path = str(tmp_path / "tetra.rsm")
    export_rsm(mesh, path)
    loaded = import_rsm(path)
    assert loaded.data.n_vertices == 4
    assert loaded.data.n_triangles == 4
    assert loaded.data.smoothing is False
    assert loaded.data.closed is True
    # triangle SET preserved (BVH permutation may reorder rows)
    got = {tuple(sorted(row)) for row in loaded.data.triangles[:, :3].tolist()}
    want = {tuple(sorted(row)) for row in t.tolist()}
    assert got == want
    np.testing.assert_allclose(loaded.data.vertices, v)


def test_rsm_bad_header_raises(tmp_path):
    import pytest

    from source_tpu.primitive.mesh import import_rsm

    path = tmp_path / "bad.rsm"
    path.write_bytes(b"NOT A MESH")
    with pytest.raises(ValueError):
        import_rsm(str(path))
