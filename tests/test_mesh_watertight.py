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


# --- irregular-mesh (bunny-class) watertightness (VERDICT r3 next #7) --------
# The cube tests above prove the crack-free property for axis-aligned
# geometry only; these aim rays exactly at shared edges/vertices of a
# closed DISPLACED icosphere (the repo's bunny stand-in: irregular,
# sliver-prone triangles at every orientation) including grazing-incidence
# silhouette aims, and march each ray through the full solid asserting an
# EVEN crossing count with alternating enter/exit flags — a double-hit or
# a leak at any shared feature breaks the parity. Reference algorithm
# this substitutes for: the Woop-Benthin-Wald watertight test,
# mesh.pyx:566-713.


def _blob_mesh(subdiv=3, seed=11, **kw):
    """Closed displaced icosphere: irregular triangles, no two coplanar."""
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
    # lumpy displacement -> irregular/sliver triangles at all orientations
    rng = np.random.RandomState(seed)
    amps = rng.uniform(-1, 1, (6, 4))
    r = 1.0
    for k in range(6):
        r = r + 0.12 * amps[k, 0] * np.sin(
            (k + 1) * verts[:, 0] + amps[k, 1]) * np.cos(
            (k + 2) * verts[:, 1] + amps[k, 2]) * np.sin(
            (k + 1) * verts[:, 2] + amps[k, 3])
    verts = verts * r[:, None]
    return (Mesh(vertices=verts.astype(np.float32), triangles=faces,
                 smoothing=False, closed=True, **kw),
            verts.astype(np.float32), faces)


def _march_crossings(scene, o, d, max_steps=16):
    """All surface crossings along each ray.

    Returns (count[N], crossings) where crossings is a list of
    (s, exiting) arrays per step (s = cumulative path distance, NaN when
    that step found nothing for the lane)."""
    N = o.shape[0]
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    count = np.zeros(N, np.int64)
    s_total = np.zeros(N, np.float64)
    active = np.ones(N, bool)
    crossings = []
    fn = jax.jit(lambda o, d: intersect_scene(scene, o, d))
    for _ in range(max_steps):
        rec = fn(o, d)
        hit = np.asarray(rec.hit) & active
        if not hit.any():
            break
        ex = np.asarray(rec.exiting)
        t = np.asarray(rec.t)
        s_here = np.where(hit, s_total + t, np.nan)
        crossings.append((s_here, ex))
        count += hit
        step = np.where(hit, t + 1e-4 * (1.0 + np.abs(t)), 0.0)
        s_total += step
        o = o + jnp.asarray(step[:, None], jnp.float32) * d
        active &= hit
    return count, crossings


def _lane_crossings(crossings, lane):
    ss, exs = [], []
    for s_arr, ex_arr in crossings:
        if np.isfinite(s_arr[lane]):
            ss.append(float(s_arr[lane]))
            exs.append(bool(ex_arr[lane]))
    return ss, exs


def _strict_parity_ok(ss, exs):
    """Even count, strict enter/exit alternation starting with an enter."""
    if len(exs) % 2:
        return False
    expect = False
    for ex in exs:
        if ex != expect:
            return False
        expect = not expect
    return True


def test_blob_edge_vertex_grazing_watertight():
    w = World()
    mesh, verts, faces = _blob_mesh(parent=w, material=AbsorbingSurface())
    scene = compile_scene(w, SpectralConfig(375.0, 740.0, 1))
    rng = np.random.RandomState(3)

    # shared edges + vertices, with face normals for grazing construction
    e0 = verts[faces[:, [0, 1, 2]].ravel()]
    e1 = verts[faces[:, [1, 2, 0]].ravel()]
    n_f = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                   verts[faces[:, 2]] - verts[faces[:, 0]])
    n_f /= np.linalg.norm(n_f, axis=1, keepdims=True)
    n_e = np.repeat(n_f, 3, axis=0)

    targets, origins = [], []
    sel = rng.choice(len(e0), 64, replace=False)
    for i in sel:
        m = 0.5 * (e0[i] + e1[i])  # shared-edge midpoint
        o = m - 4.0 * (m / np.linalg.norm(m)) + rng.normal(scale=0.3, size=3)
        targets.append(m)
        origins.append(o)
    vsel = rng.choice(len(verts), 32, replace=False)
    for i in vsel:
        v = verts[i]
        o = v - 4.0 * (v / np.linalg.norm(v)) + rng.normal(scale=0.3, size=3)
        targets.append(v)
        origins.append(o)
    targets = np.asarray(targets)
    origins = np.asarray(origins)
    d = targets - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    count, crossings = _march_crossings(scene, origins, d)
    # every edge/vertex-aimed ray passes through the closed surface with a
    # strictly alternating even crossing sequence: a leak at the shared
    # feature (neither triangle hit) or a double-hit (both counted) breaks
    # this for near-normal incidence
    assert (count >= 2).all(), count.min()
    for lane in range(len(origins)):
        ss, exs = _lane_crossings(crossings, lane)
        assert _strict_parity_ok(ss, exs), (lane, ss, exs)

    # grazing-incidence silhouette aims: direction nearly tangent at a
    # shared edge midpoint, origin well outside. At tangency the surface
    # can be KISSED (enter+exit closer than the eps re-march resolution —
    # the reference next_intersection re-march, mesh.pyx:1213-1276, has
    # the same floor), so instead of flag parity the assertion uses the
    # CONTAINMENT ORACLE: wherever a crossing's two sides genuinely lie in
    # different regions, the exiting flag must match the transition, and
    # every terminated march must end OUTSIDE the closed solid (a crack
    # would strand the parity inside).
    gsel = rng.choice(len(e0), 48, replace=False)
    g_o, g_d = [], []
    for i in gsel:
        m = 0.5 * (e0[i] + e1[i])
        n = n_e[i]
        tangent = np.cross(n, rng.normal(size=3))
        tangent /= np.linalg.norm(tangent)
        dd = tangent - 0.01 * n  # graze inward
        dd /= np.linalg.norm(dd)
        g_o.append(m - 6.0 * dd)  # well outside the blob's max radius
        g_d.append(dd)
    g_o = np.asarray(g_o)
    g_d = np.asarray(g_d)
    assert (np.linalg.norm(g_o, axis=1) > 2.5).all()  # origins outside
    count, crossings = _march_crossings(scene, g_o, g_d)
    assert (count >= 1).sum() >= len(g_o) // 2  # the sweep hits things

    eps_probe = 2e-3
    probes = []
    probe_meta = []  # (lane, j, exiting)
    ends = []
    for lane in range(len(g_o)):
        ss, exs = _lane_crossings(crossings, lane)
        for j, (sj, ex) in enumerate(zip(ss, exs)):
            near_prev = j > 0 and sj - ss[j - 1] < 2 * eps_probe
            near_next = j + 1 < len(ss) and ss[j + 1] - sj < 2 * eps_probe
            if near_prev or near_next:
                continue  # probe windows would straddle a neighbour
            probes.append(g_o[lane] + (sj - eps_probe) * g_d[lane])
            probes.append(g_o[lane] + (sj + eps_probe) * g_d[lane])
            probe_meta.append((lane, j, ex))
        if len(ss) < 14:  # march terminated (did not truncate at max_steps)
            end_s = (ss[-1] + eps_probe) if ss else 12.0
            ends.append((lane, g_o[lane] + end_s * g_d[lane]))
    all_pts = np.asarray(probes + [p for _, p in ends], np.float32)
    inside = np.asarray(entity_contains(
        scene, jnp.asarray(all_pts)))[:, 0]
    n_checked = 0
    for k, (lane, j, ex) in enumerate(probe_meta):
        c_b, c_a = bool(inside[2 * k]), bool(inside[2 * k + 1])
        if c_b != c_a:
            # true boundary transition: flag must agree (exiting == was
            # inside before the crossing)
            assert ex == c_b, (lane, j, ex, c_b, c_a)
            n_checked += 1
        # c_b == c_a is a tangential kiss: flag genuinely ambiguous
    assert n_checked >= len(g_o)  # the oracle check is not vacuous
    for k, (lane, _pt) in enumerate(ends):
        assert not bool(inside[2 * len(probe_meta) + k]), lane
