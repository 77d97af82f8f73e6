"""Pallas TPU packet-BVH traversal over ANALYTIC leaves.

Logarithmic scene acceleration for analytic scenes — the TPU-native
equivalent of the reference's primitive kd-tree
(raysect/core/acceleration/kdtree.pyx:41-180 over the SAH builder in
core/math/spatial/kdtree3d.pyx:103): instead of streaming every ray
against every leaf (tracer/intersect.py — linear in leaf count, measured
0.43M rays/s at 501 leaves), rays walk a world-space SAH BVH over the
leaf AABBs and only test the leaves whose bounds they enter.

Same machinery as the mesh packet kernel (pallas_mesh.py):

  * rays are processed in TILES of 8x128 = 1024 (one VPU register shape);
  * the threaded skip-pointer BVH (accel/bvh.py, csrc/bvh.cpp SAH build)
    and the BVH-ordered leaf tables live entirely in VMEM as lane-major
    record planes — a node/leaf read is one dynamic-sublane row load;
  * each tile walks the tree with ONE shared node pointer (packet
    traversal): descend when ANY lane's slab test hits, else follow the
    skip pointer;
  * at a BVH leaf, each stored analytic leaf is tested in ITS OWN local
    frame: the 3x4 world->local rows ride the record, the transform is 18
    fused multiply-adds on (8,128) registers, and the per-type
    nearest-positive-crossing closed forms (component-wise ports of
    primitive/analytic.py) run under a lax.switch on the record's type.

Covered types: sphere, box, cylinder, cone, parabola. Torus leaves (a
quartic solve — rare, expensive) and CSG child leaves (need ALL
crossings for the boolean resolve) stay on the streaming path; the
caller merges the winners.

Differentiability: the kernel returns only the winning LEAF ID per ray —
a piecewise-constant argmin — behind stop_gradient; the caller recomputes
the winner's crossing differentiably from the gathered leaf row
(intersect.py), which yields identical cotangents because only the
winning leaf's test contributes to the output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..primitive.analytic import (
    TYPE_BOX,
    TYPE_CONE,
    TYPE_CYLINDER,
    TYPE_PARABOLA,
    TYPE_SPHERE,
    TYPE_TORUS,
)
from .pallas_mesh import _LANES, _TILE, _pack_rays, _pack_records

__all__ = [
    "BVH_TYPES", "pack_leaf_bvh_host", "analytic_bvh_winner",
]

# types the packet kernel evaluates inline (torus quartics stream instead)
BVH_TYPES = (TYPE_SPHERE, TYPE_BOX, TYPE_CYLINDER, TYPE_CONE, TYPE_PARABOLA)

# kernel-internal record types for the world-space fast paths
KT_SPHERE_W = 6  # rigid(+uniform scale) sphere: [cx, cy, cz, r_world]
KT_BOX_W = 7     # rotation-free box: world AABB [lo3, hi3]

_REC = 16
_REC_PER_ROW = _LANES // _REC
# byte ceiling for the SMEM-resident node+leaf tables (pack_leaf_bvh_host
# returns (None, None) above it so compile_scene keeps the streaming path)
SMEM_TABLE_BUDGET = 192 * 1024
# plain python float: a module-level jnp scalar would be captured as a
# traced constant by the pallas kernel closure (pallas rejects that)
_BIG = 3e38


def _local_aabb(type_id, p):
    """Local-frame AABB of one analytic leaf from its param block
    (local conventions per primitive/analytic.py docstring)."""
    if type_id == TYPE_SPHERE:
        r = p[0]
        return (-r, -r, -r), (r, r, r)
    if type_id == TYPE_BOX:
        return (p[0], p[1], p[2]), (p[3], p[4], p[5])
    if type_id in (TYPE_CYLINDER, TYPE_CONE, TYPE_PARABOLA):
        r, h = p[0], p[1]
        return (-r, -r, 0.0), (r, r, h)
    if type_id == TYPE_TORUS:
        R, r = p[0], p[1]
        return (-(R + r), -(R + r), -r), (R + r, R + r, r)
    raise ValueError(f"Unknown analytic type {type_id}")


def pack_leaf_bvh_host(leaf_types, l2w, w2l, params, leaf_ids,
                       leaf_entities=None, max_leaf=4):
    """Host-side packing: SAH BVH over the world AABBs of the given leaves
    plus BVH-ordered leaf record planes for the packet kernel.

    leaf_types: int[n] analytic type per leaf (all in BVH_TYPES)
    l2w/w2l:    f64[n,4,4] local<->world transforms
    params:     f64[n,8] param blocks
    leaf_ids:   int[n] GLOBAL leaf index of each row (the kernel's output id)
    leaf_entities: int[n] owning entity per row (rides the record so the
                   forward path needs no host-side entity select)

    Returns (tables dict, (n_nodes, max_leaf, present_types)) or
    (None, None) if the count exceeds f32-exact indexing.
    """
    from ..accel.bvh import build_bvh

    n = len(leaf_ids)
    if n == 0 or n >= (1 << 24):
        return None, None
    # SMEM budget: the node [~2n, 9] + leaf [n, 23] f32 tables live in SMEM;
    # past a conservative ceiling Mosaic compilation would fail outright, so
    # fall back to the streaming path instead (ADVICE r3). ~64 KB of SMEM
    # table budget covers ~2000 leaves.
    smem_bytes = (2 * n + 1) * 9 * 4 + n * 23 * 4
    if smem_bytes > SMEM_TABLE_BUDGET:
        return None, None
    lo = np.empty((n, 3), np.float64)
    hi = np.empty((n, 3), np.float64)
    for i in range(n):
        llo, lhi = _local_aabb(int(leaf_types[i]), np.asarray(params[i]))
        # 8 local corners -> world
        cs = np.array(
            [
                [x, y, z]
                for x in (llo[0], lhi[0])
                for y in (llo[1], lhi[1])
                for z in (llo[2], lhi[2])
            ],
            np.float64,
        )
        wc = cs @ np.asarray(l2w[i])[:3, :3].T + np.asarray(l2w[i])[:3, 3]
        lo[i] = wc.min(axis=0)
        hi[i] = wc.max(axis=0)
    pad = 1e-6 * np.maximum(1.0, np.abs(np.stack([lo, hi])).max(axis=(0, 2)))
    bvh = build_bvh(
        (lo - pad[:, None]).astype(np.float32),
        (hi + pad[:, None]).astype(np.float32),
        max_leaf=max_leaf,
    )
    order = np.asarray(bvh.order)
    w2l_o = np.asarray(w2l)[order]
    l2w_o = np.asarray(l2w)[order]
    params_o = np.asarray(params)[order]
    types_o = np.asarray(leaf_types)[order].copy()
    ids_o = np.asarray(leaf_ids)[order]

    # world-space FAST records: a rigid(+uniform scale) sphere is a world
    # sphere (4 scalars), a rotation-free box is a world AABB (6 scalars) —
    # the kernel skips the 12-field local transform and most scalar loads
    # for these, which dominate leaf-test cost. Detection is exact up to
    # f32 tolerance; anything else keeps the general local-frame record.
    fast_fields = np.zeros((len(order), 8), np.float64)
    for i in range(len(order)):
        R = l2w_o[i][:3, :3]
        G = R.T @ R
        s2 = G[0, 0]
        if types_o[i] == TYPE_SPHERE and np.allclose(
                G, s2 * np.eye(3), rtol=1e-6, atol=1e-9 * max(1.0, s2)):
            c = l2w_o[i][:3, 3]
            fast_fields[i, :3] = c
            fast_fields[i, 3] = np.sqrt(s2) * params_o[i][0]
            types_o[i] = KT_SPHERE_W
        elif types_o[i] == TYPE_BOX:
            # rotation-free up to axis permutation/sign: one nonzero/row
            nz = np.abs(R) > 1e-9 * max(1.0, np.abs(R).max())
            if (nz.sum(axis=0) == 1).all() and (nz.sum(axis=1) == 1).all():
                cs = np.array([
                    [x, y, z]
                    for x in (params_o[i][0], params_o[i][3])
                    for y in (params_o[i][1], params_o[i][4])
                    for z in (params_o[i][2], params_o[i][5])
                ])
                wc = cs @ R.T + l2w_o[i][:3, 3]
                fast_fields[i, :3] = wc.min(axis=0)
                fast_fields[i, 3:6] = wc.max(axis=0)
                types_o[i] = KT_BOX_W
    # Every table field is a PER-RECORD SCALAR broadcast to all ray lanes,
    # so the tables live in SMEM as plain [n, fields] f32 arrays: a dynamic
    # scalar load per field replaces the VMEM row-load + 9-22 masked
    # cross-lane extracts of the record layout (measured 2.5x faster on the
    # 500-leaf grid microbench). Integer fields ride as exact f32.
    nodes = np.stack(
        [bvh.node_lo[:, 0], bvh.node_lo[:, 1], bvh.node_lo[:, 2],
         bvh.node_hi[:, 0], bvh.node_hi[:, 1], bvh.node_hi[:, 2],
         bvh.node_skip.astype(np.float64), bvh.node_first.astype(np.float64),
         bvh.node_count.astype(np.float64)], axis=1)
    ents = (np.zeros(len(order)) if leaf_entities is None
            else np.asarray(leaf_entities)[order].astype(np.float64))
    leaves = np.stack(
        [w2l_o[:, r, c] for r in range(3) for c in range(4)]
        + [params_o[:, k] for k in range(8)]
        + [types_o.astype(np.float64), ids_o.astype(np.float64), ents],
        axis=1)
    # fast records overwrite the (unused) leading transform slots
    fast = types_o >= KT_SPHERE_W
    leaves[fast, :8] = fast_fields[fast]
    tables = {
        "nodes": nodes.astype(np.float32),
        "leaves": leaves.astype(np.float32),
    }
    present = tuple(sorted({int(t) for t in types_o}))
    # the differentiable winner recompute dispatches on the ORIGINAL
    # analytic types, not the kernel's world-space record codes
    present_orig = tuple(sorted({int(t) for t in leaf_types}))
    root_lo = tuple(float(x) for x in bvh.node_lo[0])
    root_hi = tuple(float(x) for x in bvh.node_hi[0])
    return tables, (int(bvh.n_nodes), int(max(1, bvh.max_leaf_size)), present,
                    root_lo, root_hi, present_orig)


# --- component-wise nearest-positive-crossing closed forms -------------------
# Ports of primitive/analytic.py candidate functions restructured for the
# kernel's register layout: all args/returns are (8,128) f32; each returns
# (t, inside) — the smallest boundary crossing strictly greater than t_min
# (else +BIG) plus the ray-origin containment flag (convex solids: origin
# inside <=> the winning crossing is an exit, the reference's 'exiting').
# The LOCAL outward normals at the crossing are computed by the matching
# _NORMAL_FNS entry (ports of primitive/analytic.py normal functions).


def _quad_interval(a, b, c):
    """Stable quadratic roots as an ascending (lo, hi, valid) triple."""
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    q = -0.5 * (b + jnp.where(b >= 0.0, sq, -sq))
    a_ok = jnp.abs(a) > 1e-30
    q_ok = jnp.abs(q) > 1e-30
    r0 = jnp.where(a_ok, q / jnp.where(a_ok, a, 1.0), _BIG)
    r1 = jnp.where(q_ok, c / jnp.where(q_ok, q, 1.0), r0)
    lo = jnp.minimum(r0, r1)
    hi = jnp.maximum(r0, r1)
    return lo, hi, ok & a_ok


def _first_after(t_min, *cands):
    """min over (t, valid) candidate pairs with t > t_min."""
    best = jnp.full_like(t_min, _BIG)
    for t, v in cands:
        take = v & (t > t_min) & (t < best)
        best = jnp.where(take, t, best)
    return best


def _hit_sphere(o, d, p, t_min):
    ox, oy, oz = o
    dx, dy, dz = d
    r = p[0]
    a = dx * dx + dy * dy + dz * dz
    b = 2.0 * (ox * dx + oy * dy + oz * dz)
    c = ox * ox + oy * oy + oz * oz - r * r
    lo, hi, v = _quad_interval(a, b, c)
    return _first_after(t_min, (lo, v), (hi, v)), jnp.where(c < 0.0, 1.0, 0.0)


def _n_sphere(p_loc, pp):
    return p_loc


def _hit_box(o, d, p, t_min):
    ox, oy, oz = o
    dx, dy, dz = d

    def inv(x):
        ok = jnp.abs(x) > 1e-30
        return jnp.where(ok, 1.0 / jnp.where(ok, x, 1.0),
                         jnp.where(x >= 0.0, _BIG, -_BIG))

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    t0x = (p[0] - ox) * ix; t1x = (p[3] - ox) * ix
    t0y = (p[1] - oy) * iy; t1y = (p[4] - oy) * iy
    t0z = (p[2] - oz) * iz; t1z = (p[5] - oz) * iz
    lo = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                     jnp.minimum(t0z, t1z))
    hi = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                     jnp.maximum(t0z, t1z))
    v = hi >= lo
    inside = ((ox >= p[0]) & (ox <= p[3]) & (oy >= p[1]) & (oy <= p[4])
              & (oz >= p[2]) & (oz <= p[5]))
    return _first_after(t_min, (lo, v), (hi, v)), jnp.where(inside, 1.0, 0.0)


def _box_face_normal(px, py, pz, lx, ly, lz, hx, hy, hz):
    """Largest-|normalised-coordinate| face pick (analytic.normal_box)."""
    cx, cy, cz = 0.5 * (lx + hx), 0.5 * (ly + hy), 0.5 * (lz + hz)
    ex = jnp.maximum(0.5 * (hx - lx), 1e-30)
    ey = jnp.maximum(0.5 * (hy - ly), 1e-30)
    ez = jnp.maximum(0.5 * (hz - lz), 1e-30)
    qx, qy, qz = (px - cx) / ex, (py - cy) / ey, (pz - cz) / ez
    ax, ay, az = jnp.abs(qx), jnp.abs(qy), jnp.abs(qz)
    on_x = (ax >= ay) & (ax >= az)
    on_y = ~on_x & (ay >= az)
    on_z = ~on_x & ~on_y
    sgn = lambda q: jnp.where(q >= 0.0, 1.0, -1.0)
    return (jnp.where(on_x, sgn(qx), 0.0),
            jnp.where(on_y, sgn(qy), 0.0),
            jnp.where(on_z, sgn(qz), 0.0))


def _n_box(p_loc, pp):
    return _box_face_normal(p_loc[0], p_loc[1], p_loc[2],
                            pp[0], pp[1], pp[2], pp[3], pp[4], pp[5])


def _hit_cylinder(o, d, p, t_min):
    ox, oy, oz = o
    dx, dy, dz = d
    r, h = p[0], p[1]
    a = dx * dx + dy * dy
    b = 2.0 * (ox * dx + oy * dy)
    c = ox * ox + oy * oy - r * r
    qlo, qhi, qv = _quad_interval(a, b, c)
    axial = a <= 1e-20
    inside_tube = c <= 0.0
    tube_lo = jnp.where(axial, jnp.where(inside_tube, -_BIG, _BIG),
                        jnp.where(qv, qlo, _BIG))
    tube_hi = jnp.where(axial, jnp.where(inside_tube, _BIG, -_BIG),
                        jnp.where(qv, qhi, -_BIG))
    flat = jnp.abs(dz) <= 1e-30
    sdz = jnp.where(flat, 1e-30, dz)
    s0 = (0.0 - oz) / sdz
    s1 = (h - oz) / sdz
    in_slab = (oz >= 0.0) & (oz <= h)
    slab_lo = jnp.where(flat, jnp.where(in_slab, -_BIG, _BIG), jnp.minimum(s0, s1))
    slab_hi = jnp.where(flat, jnp.where(in_slab, _BIG, -_BIG), jnp.maximum(s0, s1))
    lo = jnp.maximum(tube_lo, slab_lo)
    hi = jnp.minimum(tube_hi, slab_hi)
    v = hi >= lo
    inside = (c <= 0.0) & (oz >= 0.0) & (oz <= h)
    return _first_after(t_min, (lo, v), (hi, v)), jnp.where(inside, 1.0, 0.0)


def _n_cylinder(p_loc, pp):
    px, py, pz = p_loc
    r, h = pp[0], pp[1]
    rad = jnp.sqrt(px * px + py * py + 1e-12)
    d_side = jnp.abs(rad - r)
    d_bot = jnp.abs(pz)
    d_top = jnp.abs(pz - h)
    side = (d_side <= d_bot) & (d_side <= d_top)
    bot = ~side & (d_bot <= d_top)
    top = ~side & ~bot
    nx = jnp.where(side, px / rad, 0.0)
    ny = jnp.where(side, py / rad, 0.0)
    nz = jnp.where(bot, -1.0, jnp.where(top, 1.0, 0.0))
    return nx, ny, nz


def _hit_cone(o, d, p, t_min):
    ox, oy, oz = o
    dx, dy, dz = d
    r, h = p[0], p[1]
    k = r / h
    wo = h - oz
    wd = -dz
    a = dx * dx + dy * dy - k * k * wd * wd
    b = 2.0 * (ox * dx + oy * dy - k * k * wo * wd)
    c = ox * ox + oy * oy - k * k * wo * wo
    qlo, qhi, qv = _quad_interval(a, b, c)
    z0 = oz + qlo * dz
    z1 = oz + qhi * dz
    v0 = qv & (z0 >= 0.0) & (z0 <= h)
    v1 = qv & (z1 >= 0.0) & (z1 <= h)
    nz = jnp.abs(dz) > 1e-30
    sdz = jnp.where(nz, dz, 1e-30)
    tc = -oz / sdz
    px = ox + tc * dx
    py = oy + tc * dy
    vc = nz & (px * px + py * py <= r * r)
    lim = k * (h - oz)
    inside = (oz >= 0.0) & (oz <= h) & (ox * ox + oy * oy <= lim * lim)
    return _first_after(t_min, (qlo, v0), (qhi, v1), (tc, vc)), jnp.where(inside, 1.0, 0.0)


def _n_cone(p_loc, pp):
    px, py, pz = p_loc
    r, h = pp[0], pp[1]
    k = r / h
    rad = jnp.sqrt(px * px + py * py + 1e-12)
    d_cap = jnp.abs(pz)
    inv = 1.0 / jnp.sqrt(1.0 + k * k)
    d_cone = jnp.abs(rad - k * (h - pz)) * inv
    cap = d_cap <= d_cone
    nx = jnp.where(cap, 0.0, px / rad * inv)
    ny = jnp.where(cap, 0.0, py / rad * inv)
    nz = jnp.where(cap, -1.0, k * inv)
    return nx, ny, nz


def _hit_parabola(o, d, p, t_min):
    ox, oy, oz = o
    dx, dy, dz = d
    r, h = p[0], p[1]
    a4 = r * r / h
    a = dx * dx + dy * dy
    b = 2.0 * (ox * dx + oy * dy) + a4 * dz
    c = ox * ox + oy * oy + a4 * (oz - h)
    qlo, qhi, qv = _quad_interval(a, b, c)
    z0 = oz + qlo * dz
    z1 = oz + qhi * dz
    v0 = qv & (z0 >= 0.0) & (z0 <= h)
    v1 = qv & (z1 >= 0.0) & (z1 <= h)
    # axial ray: linear b t + c = 0
    lin = a <= 1e-20
    b_ok = jnp.abs(b) > 1e-30
    tl = -c / jnp.where(b_ok, b, 1e-30)
    zl = oz + tl * dz
    vl = lin & b_ok & (zl >= 0.0) & (zl <= h)
    t0 = jnp.where(lin, tl, qlo)
    # boolean algebra, not select: Mosaic rejects vector selects on i1
    v0 = (lin & vl) | (~lin & v0)
    v1 = v1 & ~lin
    nz = jnp.abs(dz) > 1e-30
    tc = -oz / jnp.where(nz, dz, 1e-30)
    px = ox + tc * dx
    py = oy + tc * dy
    vc = nz & (px * px + py * py <= r * r)
    inside = (oz >= 0.0) & (oz <= h) & (ox * ox + oy * oy <= a4 * (h - oz))
    return _first_after(t_min, (t0, v0), (qhi, v1), (tc, vc)), jnp.where(inside, 1.0, 0.0)


def _n_parabola(p_loc, pp):
    px, py, pz = p_loc
    r, h = pp[0], pp[1]
    a4 = r * r / h
    d_cap = jnp.abs(pz)
    rad2 = px * px + py * py
    surf = jnp.abs(rad2 + a4 * (pz - h))
    cap = d_cap <= surf * 0.5
    nx = jnp.where(cap, 0.0, 2.0 * px)
    ny = jnp.where(cap, 0.0, 2.0 * py)
    nz = jnp.where(cap, -1.0, a4)
    return nx, ny, nz


_HIT_FNS = {
    TYPE_SPHERE: _hit_sphere,
    TYPE_BOX: _hit_box,
    TYPE_CYLINDER: _hit_cylinder,
    TYPE_CONE: _hit_cone,
    TYPE_PARABOLA: _hit_parabola,
}

_NORMAL_FNS = {
    TYPE_SPHERE: _n_sphere,
    TYPE_BOX: _n_box,
    TYPE_CYLINDER: _n_cylinder,
    TYPE_CONE: _n_cone,
    TYPE_PARABOLA: _n_parabola,
}


def _kernel(n_nodes, max_leaf, present,
            o_ref, d_ref, tmin_ref, nodes_ref, leaves_ref,
            t_out, leaf_out, ent_out, ins_out, nx_out, ny_out, nz_out):
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    t_min = tmin_ref[0]

    def safe_inv(x):
        ok = jnp.abs(x) > 1e-12
        return jnp.where(ok, 1.0 / jnp.where(ok, x, 1.0), _BIG)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    def leaf_test(slot, carry):
        t_best, leaf_best, ent_best, ins_best, nx_b, ny_b, nz_b, lane_hit = carry
        gid = leaves_ref[slot, 21].astype(jnp.int32)
        eid = leaves_ref[slot, 22].astype(jnp.int32)

        # branch bodies load only the fields they need (SMEM scalar loads
        # are a large share of per-leaf cost; the world-space fast records
        # need 4-6 instead of 20). Each returns (t, inside, world normal).
        def mk_general(tid):
            def f(_):
                xf = [leaves_ref[slot, k] for k in range(12)]
                pp = [leaves_ref[slot, 12 + k] for k in range(8)]
                # ray into the leaf's local frame (3x4 affine rows)
                lox = xf[0] * ox + xf[1] * oy + xf[2] * oz + xf[3]
                loy = xf[4] * ox + xf[5] * oy + xf[6] * oz + xf[7]
                loz = xf[8] * ox + xf[9] * oy + xf[10] * oz + xf[11]
                ldx = xf[0] * dx + xf[1] * dy + xf[2] * dz
                ldy = xf[4] * dx + xf[5] * dy + xf[6] * dz
                ldz = xf[8] * dx + xf[9] * dy + xf[10] * dz
                t, ins = _HIT_FNS[tid]((lox, loy, loz), (ldx, ldy, ldz), pp,
                                       t_min)
                # local normal at the crossing, then world via (w2l)^T
                # (transform_normal inverse-transpose semantics)
                phx, phy, phz = lox + t * ldx, loy + t * ldy, loz + t * ldz
                nlx, nly, nlz = _NORMAL_FNS[tid]((phx, phy, phz), pp)
                nwx = xf[0] * nlx + xf[4] * nly + xf[8] * nlz
                nwy = xf[1] * nlx + xf[5] * nly + xf[9] * nlz
                nwz = xf[2] * nlx + xf[6] * nly + xf[10] * nlz
                return t, ins, nwx, nwy, nwz
            return f

        def f_sphere_w(_):
            cx = leaves_ref[slot, 0]
            cy = leaves_ref[slot, 1]
            cz = leaves_ref[slot, 2]
            r = leaves_ref[slot, 3]
            px, py, pz = ox - cx, oy - cy, oz - cz
            a = dx * dx + dy * dy + dz * dz
            b = 2.0 * (px * dx + py * dy + pz * dz)
            c = px * px + py * py + pz * pz - r * r
            lo, hi, v = _quad_interval(a, b, c)
            t = _first_after(t_min, (lo, v), (hi, v))
            return (t, jnp.where(c < 0.0, 1.0, 0.0),
                    px + t * dx, py + t * dy, pz + t * dz)

        def f_box_w(_):
            lx = leaves_ref[slot, 0]
            ly = leaves_ref[slot, 1]
            lz = leaves_ref[slot, 2]
            hx = leaves_ref[slot, 3]
            hy = leaves_ref[slot, 4]
            hz = leaves_ref[slot, 5]
            t0x = (lx - ox) * ix; t1x = (hx - ox) * ix
            t0y = (ly - oy) * iy; t1y = (hy - oy) * iy
            t0z = (lz - oz) * iz; t1z = (hz - oz) * iz
            lo = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            hi = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            v = hi >= lo
            t = _first_after(t_min, (lo, v), (hi, v))
            ins = jnp.where((ox >= lx) & (ox <= hx) & (oy >= ly)
                            & (oy <= hy) & (oz >= lz) & (oz <= hz), 1.0, 0.0)
            nx, ny, nz = _box_face_normal(
                ox + t * dx, oy + t * dy, oz + t * dz,
                lx, ly, lz, hx, hy, hz)
            return t, ins, nx, ny, nz

        fast = {KT_SPHERE_W: f_sphere_w, KT_BOX_W: f_box_w}

        def fn_for(tid):
            return fast.get(tid) or mk_general(tid)

        if len(present) == 1:
            t, ins, nx, ny, nz = fn_for(present[0])(None)
        else:
            typ = leaves_ref[slot, 20].astype(jnp.int32)
            # map the record's type to its branch index (scalar where-chain)
            branch = jnp.int32(0)
            for bi, tid in enumerate(present):
                branch = jnp.where(typ == tid, jnp.int32(bi), branch)
            t, ins, nx, ny, nz = jax.lax.switch(
                branch, [fn_for(tid) for tid in present], None)
        better = lane_hit & (t < t_best)
        t_best = jnp.where(better, t, t_best)
        leaf_best = jnp.where(better, gid, leaf_best)
        ent_best = jnp.where(better, eid, ent_best)
        ins_best = jnp.where(better, ins, ins_best)
        nx_b = jnp.where(better, nx, nx_b)
        ny_b = jnp.where(better, ny, ny_b)
        nz_b = jnp.where(better, nz, nz_b)
        return t_best, leaf_best, ent_best, ins_best, nx_b, ny_b, nz_b, lane_hit

    def body(carry):
        node, t_best, leaf_best, ent_best, ins_best, nx_b, ny_b, nz_b = carry
        blx = nodes_ref[node, 0]
        bly = nodes_ref[node, 1]
        blz = nodes_ref[node, 2]
        bhx = nodes_ref[node, 3]
        bhy = nodes_ref[node, 4]
        bhz = nodes_ref[node, 5]
        f_skip = nodes_ref[node, 6]
        f_first = nodes_ref[node, 7]
        f_count = nodes_ref[node, 8]
        t0x = (blx - ox) * ix; t1x = (bhx - ox) * ix
        t0y = (bly - oy) * iy; t1y = (bhy - oy) * iy
        t0z = (blz - oz) * iz; t1z = (bhz - oz) * iz
        tnear = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                        jnp.minimum(t0y, t1y)),
                            jnp.minimum(t0z, t1z))
        tfar = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        lane_hit = (tfar >= jnp.maximum(tnear, 0.0)) & (tnear < t_best)
        any_hit = jnp.any(lane_hit)
        n_skip = f_skip.astype(jnp.int32)
        n_first = f_first.astype(jnp.int32)
        n_count = f_count.astype(jnp.int32)
        is_leaf = n_count > 0

        def do_leaf(c):
            *st, lh = c
            for k in range(max_leaf):
                take = k < n_count
                slot = jnp.where(take, n_first + k, 0)
                *st, _ = leaf_test(slot, (*st, lh & take))
            return (*st, lh)

        t_best, leaf_best, ent_best, ins_best, nx_b, ny_b, nz_b, _ = (
            jax.lax.cond(
                any_hit & is_leaf, do_leaf, lambda c: c,
                (t_best, leaf_best, ent_best, ins_best,
                 nx_b, ny_b, nz_b, lane_hit)))
        nxt = jnp.where(any_hit & ~is_leaf, node + 1, n_skip)
        return (nxt, t_best, leaf_best, ent_best, ins_best,
                nx_b, ny_b, nz_b)

    shape = ox.shape
    init = (
        jnp.int32(0),
        jnp.full(shape, _BIG, jnp.float32),
        jnp.full(shape, -1, jnp.int32),
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    (_, t_best, leaf_best, ent_best, ins_best, nx_b, ny_b, nz_b) = (
        jax.lax.while_loop(lambda c: c[0] < n_nodes, body, init))
    # unit outward normal (downstream orientation flip expects unit length)
    inv_len = jax.lax.rsqrt(nx_b * nx_b + ny_b * ny_b + nz_b * nz_b + 1e-24)
    t_out[...] = t_best
    leaf_out[...] = leaf_best
    ent_out[...] = ent_best
    ins_out[...] = (ins_best > 0.5).astype(jnp.int32)
    nx_out[...] = nx_b * inv_len
    ny_out[...] = ny_b * inv_len
    nz_out[...] = nz_b * inv_len


def _part1by2(x):
    """Spread 10 bits of x to every third bit (Morton interleave step)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def _coherence_order(origin, direction, root_lo, root_hi):
    """Packet-coherence sort key: direction octant (3 high bits) then a
    15-bit Morton code of the origin inside the root AABB. Bounce rays are
    incoherent; sorting them per call restores the spatial/directional
    locality the shared-node-pointer packet traversal needs (a divergent
    tile visits the UNION of its rays' node paths)."""
    lo = jnp.asarray(root_lo, origin.dtype)
    span = jnp.maximum(jnp.asarray(root_hi, origin.dtype) - lo, 1e-6)
    octant = ((direction[:, 0] > 0).astype(jnp.int32) * 4
              + (direction[:, 1] > 0).astype(jnp.int32) * 2
              + (direction[:, 2] > 0).astype(jnp.int32))
    q = jnp.clip((origin - lo[None]) / span[None], 0.0, 1.0)
    qi = (q * 31.0).astype(jnp.int32)  # 5 bits per axis
    morton = (_part1by2(qi[:, 0]) << 2) | (_part1by2(qi[:, 1]) << 1) | _part1by2(qi[:, 2])
    key = (octant << 15) | morton
    n = origin.shape[0]
    _, order = jax.lax.sort(
        (key, jax.lax.iota(jnp.int32, n)), dimension=0, num_keys=1
    )
    return order


def analytic_bvh_winner(tables, meta, origin, direction, t_min,
                        sort_rays=True):
    """Packet-BVH nearest-hit over the packed analytic leaves.

    origin/direction f32[N,3] WORLD space, t_min f32[N] (minimum advance).
    Returns a dict of NON-differentiable per-ray winner fields:
      t      f32[N]  crossing distance (+inf miss) — ordering only
      leaf   i32[N]  global leaf id (-1 miss)
      entity i32[N]  owning entity (-1 miss)
      inside bool[N] ray origin inside the solid (reference 'exiting')
      normal f32[N,3] unit outward world normal at the crossing
    The differentiable path recomputes the winner's crossing from the
    scene tables; the forward-only path consumes these fields directly.
    """
    n_nodes, max_leaf, present, root_lo, root_hi = meta[:5]
    origin = jax.lax.stop_gradient(origin)
    direction = jax.lax.stop_gradient(direction)
    t_min = jax.lax.stop_gradient(t_min)
    N = origin.shape[0]
    order = None
    if sort_rays and N > _TILE:
        order = _coherence_order(origin, direction, root_lo, root_hi)
        origin = origin[order]
        direction = direction[order]
        t_min = t_min[order]
    o_p, d_p, t_p, n_pad, rows = _pack_rays(origin, direction, t_min)
    rows_per_tile = _TILE // _LANES
    grid = n_pad // _TILE
    ray_spec = pl.BlockSpec((3, rows_per_tile, _LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    tmin_spec = pl.BlockSpec((1, rows_per_tile, _LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    # table fields are per-record scalars -> SMEM (cheap dynamic scalar
    # loads; a VMEM record layout costs masked cross-lane extracts instead)
    table_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((rows_per_tile, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, int(n_nodes), int(max_leaf),
                               tuple(present))

    def _run(o_p, d_p, t_p, nodes, leaves):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[ray_spec, ray_spec, tmin_spec] + [table_spec] * 2,
            out_specs=(out_spec,) * 7,
            out_shape=(
                jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
                jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
                jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
                jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            ),
            interpret=jax.default_backend() != "tpu",
        )(o_p, d_p, t_p, nodes, leaves)

    # the traversal is an argmin — piecewise constant — so it carries NO
    # tangents: a custom_vjp with zero cotangents lets jax.checkpoint /
    # reverse-mode linearize straight through (stop_gradient alone is not
    # enough — linearization still demands a JVP rule for pallas_call)
    run = jax.custom_vjp(_run)
    _zero_cots = (
        lambda: jnp.zeros((3, rows, _LANES), jnp.float32),
        lambda: jnp.zeros((3, rows, _LANES), jnp.float32),
        lambda: jnp.zeros((1, rows, _LANES), jnp.float32),
        lambda: jnp.zeros(tables["nodes"].shape, jnp.float32),
        lambda: jnp.zeros(tables["leaves"].shape, jnp.float32),
    )
    run.defvjp(
        lambda *a: (_run(*a), None),
        lambda res, g: tuple(z() for z in _zero_cots),
    )
    t, leaf, ent, ins, nx, ny, nz = run(
        o_p, d_p, t_p, tables["nodes"], tables["leaves"])
    outs = [x.reshape(n_pad)[:N] for x in (t, leaf, ent, ins, nx, ny, nz)]
    if order is not None:
        # scatter back to original lane order
        outs = [jnp.zeros_like(x).at[order].set(x) for x in outs]
    t, leaf, ent, ins, nx, ny, nz = outs
    return {
        "t": jnp.where(leaf >= 0, t, jnp.inf),
        "leaf": leaf,
        "entity": jnp.where(leaf >= 0, ent, -1),
        "inside": ins > 0,
        "normal": jnp.stack([nx, ny, nz], axis=-1),
    }
