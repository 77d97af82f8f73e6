"""Watertightness of the triangle intersection at f32 (VERDICT r2 #6).

The reference implements the Woop-Benthin-Wald watertight test with an f64
fallback (mesh.pyx:566-713); this port uses Möller–Trumbore with a relative
epsilon pad (meshtrace.py tol=1e-6). The pad makes shared edges/vertices hit
by BOTH adjacent triangles instead of neither — these tests prove the
crack-free property the reference's algorithm guarantees: rays aimed
EXACTLY at shared edges, vertices and the body diagonal of a closed cube
mesh never leak, and a dense contains() sweep classifies every point
correctly."""

import numpy as np

import jax
import jax.numpy as jnp

from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.core.scenegraph import World
from source_tpu.optical.material import AbsorbingSurface
from source_tpu.primitive.mesh import Mesh
from source_tpu.tracer.intersect import entity_contains, intersect_scene


def _cube_mesh(**kw):
    """Closed unit cube [-1,1]^3, 12 triangles, shared edges everywhere."""
    v = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
        dtype=np.float32,
    )
    # index: bit2 = x, bit1 = y, bit0 = z
    f = np.array([
        [0, 1, 3], [0, 3, 2],  # x = -1 face (outward -x)
        [4, 6, 7], [4, 7, 5],  # x = +1
        [0, 4, 5], [0, 5, 1],  # y = -1
        [2, 3, 7], [2, 7, 6],  # y = +1
        [0, 2, 6], [0, 6, 4],  # z = -1
        [1, 5, 7], [1, 7, 3],  # z = +1
    ], dtype=np.int32)
    return Mesh(vertices=v, triangles=f, smoothing=False, closed=True, **kw)


def _scene():
    w = World()
    _cube_mesh(parent=w, material=AbsorbingSurface())
    return compile_scene(w, SpectralConfig(375.0, 740.0, 1))


def test_edge_and_vertex_aimed_rays_never_leak():
    scene = _scene()
    targets = []
    # all 8 vertices
    for x in (-1, 1):
        for y in (-1, 1):
            for z in (-1, 1):
                targets.append((x, y, z))
    # all 12 edge midpoints
    for a in (-1, 1):
        for b in (-1, 1):
            targets.append((0.0, a, b))
            targets.append((a, 0.0, b))
            targets.append((a, b, 0.0))
    # face-diagonal midpoints = shared internal edges of each face pair
    for a in (-1, 1):
        targets.append((a, 0.0, 0.0))
        targets.append((0.0, a, 0.0))
        targets.append((0.0, 0.0, a))
    targets = np.asarray(targets, dtype=np.float32)
    origin = np.asarray([5.0, 4.0, 3.0], np.float32)
    d = targets - origin
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(origin, d.shape)
    rec = intersect_scene(scene, jnp.asarray(o), jnp.asarray(d))
    hit = np.asarray(rec.hit)
    assert hit.all(), targets[~hit]


def test_axis_aligned_edge_rays():
    """Axis-aligned rays whose path lies exactly in a face plane and crosses
    shared edges — the classic crack case."""
    scene = _scene()
    o, d = [], []
    for axis in range(3):
        for u_val in (-1.0, 0.0, 1.0):
            for v_val in (-1.0, 0.0, 1.0):
                direction = np.zeros(3, np.float32)
                direction[axis] = 1.0
                origin = np.zeros(3, np.float32)
                origin[axis] = -5.0
                origin[(axis + 1) % 3] = u_val
                origin[(axis + 2) % 3] = v_val
                o.append(origin)
                d.append(direction)
    rec = intersect_scene(scene, jnp.asarray(np.stack(o)), jnp.asarray(np.stack(d)))
    hit = np.asarray(rec.hit)
    t = np.asarray(rec.t)
    assert hit.all(), np.stack(o)[~hit]
    assert np.allclose(t[hit], 4.0, atol=1e-3)  # first face at distance 4


def test_contains_sweep_f32():
    """Dense containment sweep over a lattice INCLUDING points exactly on
    the projection lines of edges/vertices: inside/outside must classify by
    true geometry with zero leaks (mesh.pyx:805-831 parity semantics)."""
    scene = _scene()
    lin = np.linspace(-1.5, 1.5, 21, dtype=np.float32)  # includes 0, ±0.75, ±1.5
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)
    # stay off the boundary surface itself (ambiguous by definition)
    margin = 0.05
    on_surface = (np.abs(np.abs(pts) - 1.0) < margin).any(axis=-1) & (
        np.abs(pts) <= 1.0 + margin
    ).all(axis=-1)
    keep = ~on_surface
    pts = pts[keep]
    expected = (np.abs(pts) < 1.0).all(axis=-1)
    got = np.asarray(entity_contains(scene, jnp.asarray(pts)))[:, 0]
    leaks = expected != got
    assert not leaks.any(), pts[leaks][:10]
