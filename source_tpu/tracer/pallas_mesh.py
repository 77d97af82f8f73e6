"""Pallas TPU packet-traversal kernel for mesh BVH intersection.

The XLA expression of the stackless traversal (meshtrace.py) performs one
dynamic HBM gather per ray lane per tree step — on TPU those gathers
serialize, measuring ~3 s for 262k rays against a 1.3k-triangle mesh
(≈1000x off speed-of-light). This kernel restructures the traversal the
TPU way (reference algorithm: raysect mesh.pyx:506-713 kd traversal +
triangle test):

  * rays are processed in TILES of 8x128 = 1024 (one VPU register shape);
  * the whole BVH (threaded skip-pointer layout, accel/bvh.py) and the
    BVH-permuted triangle vertices live in VMEM, packed lane-major as
    [ceil(n/128), 128] planes so a node/triangle read is a scalar 2-D
    index, not a vector gather;
  * each tile walks the tree with ONE shared node pointer (packet
    traversal): descend if ANY lane's slab test hits, else follow the
    skip pointer. Leaf triangles are tested by broadcasting the (up to
    max_leaf) triangles against all 1024 lanes on the VPU.

Coherent tiles (camera rays, compaction-sorted bounce rays) visit near
the per-ray optimal node set; fully divergent tiles degrade toward the
union of their rays' paths — still VPU-wide arithmetic with zero gathers.

Differentiability: the kernel is wrapped in jax.custom_vjp. The backward
pass recomputes the Möller–Trumbore system for the (saved) winning
triangle per ray in plain JAX and differentiates that — identical
cotangents to AD through the full traversal, because only the winning
triangle's test contributes to the output (the argmin selection is
piecewise constant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .watertight import woop_setup, woop_tri_test

_TILE = 1024  # rays per packet: 8 sublanes x 128 lanes
_LANES = 128


def _pack_plane(arr, dtype):
    """Host-pack a 1-D array as a lane-major [ceil(n/128), 128] plane."""
    a = np.asarray(arr, dtype)
    n = a.shape[0]
    rows = max(1, -(-n // _LANES))
    out = np.zeros((rows, _LANES), dtype)
    out.reshape(-1)[:n] = a
    return out


TABLE_ORDER = ("nodes", "tris")

# VMEM budget for the packed tables; larger meshes fall back to the XLA path
VMEM_TABLE_LIMIT = 10 * 1024 * 1024

_REC = 16      # lanes per record (9 fields used, 16 for alignment)
_REC_PER_ROW = _LANES // _REC  # 8 records per 128-lane row


def _pack_records(fields):
    """Pack k<=16 per-item f32 fields as 16-lane records, 8 per row."""
    n = fields[0].shape[0]
    rows = max(1, -(-n // _REC_PER_ROW))
    out = np.zeros((rows, _LANES), np.float32)
    flat = out.reshape(-1, _REC)
    for f, col in enumerate(fields):
        flat[:n, f] = col.astype(np.float32)
    return out


def pack_mesh_host(vertices, triangles, node_lo, node_hi, node_skip,
                   node_first, node_count):
    """Host-side packing for the packet kernel: one 16-lane f32 record per
    BVH node (lo.xyz, hi.xyz, skip, first, count) and per triangle
    (v0.xyz, v1.xyz, v2.xyz), 8 records per 128-lane VMEM row, so the
    kernel reads a record with ONE dynamic-sublane row load. Integer fields
    are stored as exact f32 (indices < 2^24). Returns None when the tables
    exceed the VMEM budget (the XLA path handles those meshes)."""
    tris = np.asarray(triangles)
    verts = np.asarray(vertices).astype(np.float32)
    lo = np.asarray(node_lo, np.float32)
    hi = np.asarray(node_hi, np.float32)
    if max(len(tris), len(node_skip)) >= (1 << 24):
        return None  # f32-exact integer range exceeded
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    packed = {
        "nodes": _pack_records([
            lo[:, 0], lo[:, 1], lo[:, 2], hi[:, 0], hi[:, 1], hi[:, 2],
            np.asarray(node_skip), np.asarray(node_first),
            np.asarray(node_count),
        ]),
        "tris": _pack_records([
            v0[:, 0], v0[:, 1], v0[:, 2], v1[:, 0], v1[:, 1], v1[:, 2],
            v2[:, 0], v2[:, 1], v2[:, 2],
        ]),
    }
    if sum(v.nbytes for v in packed.values()) > VMEM_TABLE_LIMIT:
        return None
    return packed


def pack_mesh_paged_host(vertices, triangles, max_leaf=4,
                         page_limit=VMEM_TABLE_LIMIT // 2):
    """Large-mesh paging: partition the (BVH-ordered, spatially coherent)
    triangle array into contiguous pages, build a private threaded BVH per
    page, and pack each page for the packet kernel. Rays traverse the pages
    sequentially (each page's tables fit VMEM); a ray that misses a page's
    root AABB exits that page's while-loop after one step, so the per-page
    overhead for spatially separated pages is one slab test.

    Returns (pages, metas): pages is a tuple of packed-table dicts (each
    with a ``tri_ids`` plane mapping page-local triangle ids back to the
    global triangle array), metas is ((n_nodes, max_leaf), ...) static
    structure. Returns (None, None) if the mesh is too large even to page
    (> 2^24 triangles, beyond f32-exact indices).
    """
    from ..accel.bvh import build_bvh

    tris = np.asarray(triangles)
    verts = np.asarray(vertices, np.float32)
    n = tris.shape[0]
    if n >= (1 << 24):
        return None, None
    # ~record bytes per triangle/node pair (tris 128B/8 + nodes ~ same)
    per_tri = 2 * (_LANES * 4) / _REC_PER_ROW  # tri rec + ~1 node rec
    tris_per_page = max(256, int(page_limit / per_tri))
    n_pages = -(-n // tris_per_page)
    pages = []
    metas = []
    for p in range(n_pages):
        start = p * tris_per_page
        stop = min(n, start + tris_per_page)
        chunk = tris[start:stop]
        v0 = verts[chunk[:, 0]]
        v1 = verts[chunk[:, 1]]
        v2 = verts[chunk[:, 2]]
        pts = np.stack([v0, v1, v2], axis=1)
        lo = pts.min(axis=1)
        hi = pts.max(axis=1)
        pad = 1e-6 * np.maximum(1.0, np.abs(pts).max(axis=(1, 2)))[:, None]
        bvh = build_bvh(lo - pad, hi + pad, max_leaf=max_leaf)
        order = np.asarray(bvh.order)
        page = {
            "nodes": _pack_records([
                bvh.node_lo[:, 0], bvh.node_lo[:, 1], bvh.node_lo[:, 2],
                bvh.node_hi[:, 0], bvh.node_hi[:, 1], bvh.node_hi[:, 2],
                np.asarray(bvh.node_skip), np.asarray(bvh.node_first),
                np.asarray(bvh.node_count),
            ]),
            "tris": _pack_records([
                v0[order, 0], v0[order, 1], v0[order, 2],
                v1[order, 0], v1[order, 1], v1[order, 2],
                v2[order, 0], v2[order, 1], v2[order, 2],
            ]),
            # page-local winner -> global triangle id
            "tri_ids": (start + order).astype(np.int32),
        }
        pages.append(page)
        metas.append((int(bvh.n_nodes), int(max(1, bvh.max_leaf_size))))

    # stack pages (padded to the max page shape) so ONE kernel iterates
    # them as an inner grid axis — 1 launch instead of n_pages serial
    # launches per bounce, with the next page's tables DMA'd during the
    # current page's traversal (VERDICT r3 next #4)
    rn = max(pg["nodes"].shape[0] for pg in pages)
    rt = max(pg["tris"].shape[0] for pg in pages)
    tpp = max(pg["tri_ids"].shape[0] for pg in pages)
    nodes_s = np.zeros((n_pages, rn, _LANES), np.float32)
    tris_s = np.zeros((n_pages, rt, _LANES), np.float32)
    ids_s = np.zeros((n_pages, tpp), np.int32)
    meta_s = np.zeros((n_pages, 1), np.int32)
    for p, pg in enumerate(pages):
        nodes_s[p, : pg["nodes"].shape[0]] = pg["nodes"]
        tris_s[p, : pg["tris"].shape[0]] = pg["tris"]
        ids_s[p, : pg["tri_ids"].shape[0]] = pg["tri_ids"]
        meta_s[p, 0] = metas[p][0]
    stacked = {"nodes": nodes_s, "tris": tris_s, "tri_ids": ids_s,
               "meta": meta_s}
    max_leaf_all = max(m[1] for m in metas)
    return stacked, (n_pages, max_leaf_all)


def _kernel(n_nodes, max_leaf,
            o_ref, d_ref, tmin_ref, nodes_ref, tris_ref,
            t_out, tri_out, u_out, v_out, front_out):
    # ray components as (8, 128) registers
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    t_min = tmin_ref[0]

    big = jnp.float32(3e38)

    def safe_inv(x):
        ok = jnp.abs(x) > 1e-12
        return jnp.where(ok, 1.0 / jnp.where(ok, x, 1.0), big)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    _iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def read_record(plane, idx):
        """ONE dynamic-sublane row load + 9 masked lane extracts (Mosaic
        cannot vector-load at a dynamic lane index, but a dynamic row is
        fine; the 8-records-per-row layout keeps the table dense)."""
        row = plane[pl.ds(idx // _REC_PER_ROW, 1), :]  # (1, 128)
        base = (idx % _REC_PER_ROW) * _REC
        zeros = jnp.zeros_like(row)
        return [jnp.sum(jnp.where(_iota == base + f, row, zeros))
                for f in range(9)]

    # per-lane Woop watertight setup, computed once per tile (shared fp
    # route with the XLA fallback's _woop_test — tracer/watertight.py)
    _wt = woop_setup(ox, oy, oz, dx, dy, dz)

    def tri_test(k_first, carry):
        t_best, tri_best, u_best, v_best, f_best, lane_ok = carry
        ax, ay, az, bx, by, bz, cx, cy, cz = read_record(tris_ref, k_first)
        t, u, v, front, valid = woop_tri_test(
            _wt, ax, ay, az, bx, by, bz, cx, cy, cz, t_min)
        valid = valid & lane_ok
        better = valid & (t < t_best)
        t_best = jnp.where(better, t, t_best)
        tri_best = jnp.where(better, k_first, tri_best)
        u_best = jnp.where(better, u, u_best)
        v_best = jnp.where(better, v, v_best)
        f_best = jnp.where(better, front.astype(jnp.int32), f_best)
        return t_best, tri_best, u_best, v_best, f_best, lane_ok

    def body(carry):
        node, t_best, tri_best, u_best, v_best, f_best = carry
        (blx, bly, blz, bhx, bhy, bhz, f_skip, f_first, f_count) = read_record(
            nodes_ref, node)
        # slab test against every lane
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
        # int fields travel as exact f32 (indices < 2^24)
        n_skip = f_skip.astype(jnp.int32)
        n_first = f_first.astype(jnp.int32)
        n_count = f_count.astype(jnp.int32)
        is_leaf = n_count > 0

        def do_leaf(c):
            t_b, tri_b, u_b, v_b, f_b, ok = c
            for k in range(max_leaf):
                take = k < n_count
                # clamp the triangle id; `take` masks the result
                tid = jnp.where(take, n_first + k, 0)
                t_b, tri_b, u_b, v_b, f_b, _ = tri_test(
                    tid, (t_b, tri_b, u_b, v_b, f_b, ok & take & lane_hit))
            return t_b, tri_b, u_b, v_b, f_b, ok

        leaf_carry = (t_best, tri_best, u_best, v_best, f_best,
                      jnp.ones_like(lane_hit))
        t_best, tri_best, u_best, v_best, f_best, _ = jax.lax.cond(
            any_hit & is_leaf, do_leaf, lambda c: c, leaf_carry)

        nxt = jnp.where(any_hit & ~is_leaf, node + 1, n_skip)
        return nxt, t_best, tri_best, u_best, v_best, f_best

    def cond(carry):
        return carry[0] < n_nodes

    shape = ox.shape
    init = (
        jnp.int32(0),
        jnp.full(shape, big, jnp.float32),
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.int32),
    )
    _, t_best, tri_best, u_best, v_best, f_best = jax.lax.while_loop(
        cond, body, init)
    t_out[...] = t_best
    tri_out[...] = tri_best
    u_out[...] = u_best
    v_out[...] = v_best
    front_out[...] = f_best


def _pack_rays(origin, direction, t_min, tile=_TILE):
    N = origin.shape[0]
    n_pad = -(-N // tile) * tile
    rows = n_pad // _LANES

    def pack3(a3):
        a = jnp.zeros((n_pad, 3), jnp.float32).at[:N].set(a3.astype(jnp.float32))
        # [n_pad, 3] -> [3, rows, 128]
        return jnp.transpose(a.reshape(rows, _LANES, 3), (2, 0, 1))

    o_p = pack3(origin)
    d_p = pack3(direction)
    t_p = jnp.zeros((1, n_pad), jnp.float32).at[0, :N].set(
        t_min.astype(jnp.float32)).reshape(1, rows, _LANES)
    return o_p, d_p, t_p, n_pad, rows


def _run_traversal(tables, n_nodes, max_leaf, o_p, d_p, t_p, n_pad, rows):
    grid = n_pad // _TILE
    rows_per_tile = _TILE // _LANES  # 8

    ray_spec = pl.BlockSpec(
        (3, rows_per_tile, _LANES), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM)
    tmin_spec = pl.BlockSpec(
        (1, rows_per_tile, _LANES), lambda i: (0, i, 0),
        memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole table
    out_spec = pl.BlockSpec(
        (rows_per_tile, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, int(n_nodes), int(max_leaf))
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[ray_spec, ray_spec, tmin_spec] + [table_spec] * 2,
        out_specs=(out_spec, out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(o_p, d_p, t_p, tables["nodes"], tables["tris"])


def mesh_intersect_pallas_fwd_impl(mesh, origin, direction, t_min):
    """Forward packet traversal. origin/direction [N,3], t_min [N].
    Returns dict(t [+inf on miss], tri, u, v, front)."""
    N = origin.shape[0]
    o_p, d_p, t_p, n_pad, rows = _pack_rays(origin, direction, t_min)
    outs = _run_traversal(mesh.packed, mesh.n_nodes, mesh.max_leaf,
                          o_p, d_p, t_p, n_pad, rows)
    t, tri, u, v, front = (x.reshape(n_pad)[:N] for x in outs)
    t = jnp.where(tri >= 0, t, jnp.inf)
    return {"t": t, "tri": tri, "u": u, "v": v, "front": front > 0}


# ray rows per tile in the paged kernel: a big tile amortises the page
# tables' HBM re-streaming (each (tile, page) grid cell DMAs that page's
# tables once), at some packet-divergence cost (env-overridable for A/B)
import os as _os

# NOTE (ADVICE r4): read at IMPORT time — set SOURCE_TPU_PAGE_TILE before
# importing this module (A/B harnesses use a fresh process per setting).
_PAGE_TILE_ROWS = int(_os.environ.get("SOURCE_TPU_PAGE_TILE", "32"))  # v5e A/B: 16->688ms, 32->637ms, 64->672ms, 128->939ms on the 1.3M-tri bigmesh (pre ray->page sort)


def _paged_kernel(max_leaf,
                  o_ref, d_ref, tmin_ref, meta_ref, nodes_ref, tris_ref,
                  t_out, tri_out, pg_out, u_out, v_out, front_out):
    """One (ray-tile, page) grid cell: traverse this page's private BVH
    and merge with the running winner (the out blocks are revisited across
    the inner page axis, so they stay VMEM-resident and act as the
    accumulator; page tables double-buffer across iterations)."""
    p = pl.program_id(1)
    n_nodes = meta_ref[p, 0]
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    t_min = tmin_ref[0]

    big = jnp.float32(3e38)

    # running winner from the revisited out blocks (page axis innermost):
    # seeding the traversal's t_best with it prunes every node/triangle
    # beyond an earlier page's hit (VERDICT r4 next #3 cross-page pruning)
    shape = ox.shape
    first = p == 0
    prev_t = jnp.where(first, jnp.full(shape, big, jnp.float32), t_out[...])
    prev_tri = jnp.where(first, jnp.full(shape, -1, jnp.int32), tri_out[...])
    prev_pg = jnp.where(first, jnp.zeros(shape, jnp.int32), pg_out[...])
    prev_u = jnp.where(first, jnp.zeros(shape, jnp.float32), u_out[...])
    prev_v = jnp.where(first, jnp.zeros(shape, jnp.float32), v_out[...])
    prev_f = jnp.where(first, jnp.zeros(shape, jnp.int32), front_out[...])

    def safe_inv(x):
        ok = jnp.abs(x) > 1e-12
        return jnp.where(ok, 1.0 / jnp.where(ok, x, 1.0), big)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    _iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    def read_record(plane, idx):
        row = plane[0, pl.ds(idx // _REC_PER_ROW, 1), :]  # (1, 128)
        base = (idx % _REC_PER_ROW) * _REC
        zeros = jnp.zeros_like(row)
        return [jnp.sum(jnp.where(_iota == base + f, row, zeros))
                for f in range(9)]

    # per-lane Woop watertight setup, computed once per tile (shared fp
    # route with the XLA fallback's _woop_test — tracer/watertight.py)
    _wt = woop_setup(ox, oy, oz, dx, dy, dz)

    def tri_test(k_first, carry):
        t_best, tri_best, u_best, v_best, f_best, lane_ok = carry
        ax, ay, az, bx, by, bz, cx, cy, cz = read_record(tris_ref, k_first)
        t, u, v, front, valid = woop_tri_test(
            _wt, ax, ay, az, bx, by, bz, cx, cy, cz, t_min)
        valid = valid & lane_ok
        better = valid & (t < t_best)
        t_best = jnp.where(better, t, t_best)
        tri_best = jnp.where(better, k_first, tri_best)
        u_best = jnp.where(better, u, u_best)
        v_best = jnp.where(better, v, v_best)
        f_best = jnp.where(better, front.astype(jnp.int32), f_best)
        return t_best, tri_best, u_best, v_best, f_best, lane_ok

    def body(carry):
        node, t_best, tri_best, u_best, v_best, f_best = carry
        (blx, bly, blz, bhx, bhy, bhz, f_skip, f_first, f_count) = read_record(
            nodes_ref, node)
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
            t_b, tri_b, u_b, v_b, f_b, ok = c
            for k in range(max_leaf):
                take = k < n_count
                tid = jnp.where(take, n_first + k, 0)
                t_b, tri_b, u_b, v_b, f_b, _ = tri_test(
                    tid, (t_b, tri_b, u_b, v_b, f_b, ok & take & lane_hit))
            return t_b, tri_b, u_b, v_b, f_b, ok

        leaf_carry = (t_best, tri_best, u_best, v_best, f_best,
                      jnp.ones_like(lane_hit))
        t_best, tri_best, u_best, v_best, f_best, _ = jax.lax.cond(
            any_hit & is_leaf, do_leaf, lambda c: c, leaf_carry)
        nxt = jnp.where(any_hit & ~is_leaf, node + 1, n_skip)
        return nxt, t_best, tri_best, u_best, v_best, f_best

    init = (
        jnp.int32(0),
        prev_t,  # seeded with the running winner: cross-page pruning
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.int32),
    )
    _, t_best, tri_best, u_best, v_best, f_best = jax.lax.while_loop(
        lambda c: c[0] < n_nodes, body, init)

    # merge with the running winner: tri_best >= 0 iff this page found a
    # hit STRICTLY closer than prev_t (t_best was seeded with prev_t)
    better = tri_best >= 0
    t_out[...] = jnp.where(better, t_best, prev_t)
    tri_out[...] = jnp.where(better, tri_best, prev_tri)
    pg_out[...] = jnp.where(better, jnp.zeros(shape, jnp.int32) + p, prev_pg)
    u_out[...] = jnp.where(better, u_best, prev_u)
    v_out[...] = jnp.where(better, v_best, prev_v)
    front_out[...] = jnp.where(better, f_best, prev_f)


def _primary_page(tables, origin, direction):
    """Per-ray id of the nearest page whose root AABB the ray enters
    (n_pages for rays that miss every page): the ray->page assignment key.
    The root record is record 0 of each page's node plane (lanes 0..5 =
    lo.xyz, hi.xyz)."""
    roots = tables["nodes"][:, 0, :6]  # [P, 6]
    lo = roots[:, 0:3]
    hi = roots[:, 3:6]
    inv = jnp.where(jnp.abs(direction) > 1e-12, 1.0 / direction,
                    jnp.where(direction >= 0, 3e38, -3e38))
    t0 = (lo[None, :, :] - origin[:, None, :]) * inv[:, None, :]
    t1 = (hi[None, :, :] - origin[:, None, :]) * inv[:, None, :]
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)  # [N, P]
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = tfar >= jnp.maximum(tnear, 0.0)
    keyed = jnp.where(hit, tnear, 3e38)
    prim = jnp.argmin(keyed, axis=1).astype(jnp.int32)
    return jnp.where(jnp.any(hit, axis=1), prim,
                     jnp.int32(tables["nodes"].shape[0]))


def mesh_intersect_pallas_paged_impl(mesh, origin, direction, t_min):
    """Paged packet traversal for meshes whose tables exceed VMEM: ONE
    kernel with a (ray-tile, page) grid — pages iterate innermost, each
    tile's winner block stays VMEM-resident as the accumulator, and page
    tables stream through double-buffered DMA (previously n_pages serial
    launches per query). Page-local winner ids map back through the
    stacked tri_ids plane.

    Ray->page assignment (VERDICT r4 next #3): rays are sorted by their
    nearest-entered page root (stable, so camera/Morton coherence survives
    within a group) before tiling, so each packet tile's lanes want the
    SAME page — the per-(tile, page) traversal walks that page's real node
    set instead of the divergent union, and the winner-seeded t_best
    prunes the remaining pages' subtrees. Reference analogue: kd-tree
    traversal touches only the leaves a ray crosses
    (raysect/core/math/spatial/kdtree3d.pyx:589-700)."""
    N = origin.shape[0]
    tile = _PAGE_TILE_ROWS * _LANES
    perm = jnp.argsort(_primary_page(mesh.packed, origin, direction),
                       stable=True)
    origin = origin[perm]
    direction = direction[perm]
    t_min = t_min[perm]
    o_p, d_p, t_p, n_pad, rows = _pack_rays(origin, direction, t_min,
                                            tile=tile)
    n_pages, max_leaf = mesh.page_meta
    tables = mesh.packed
    rn = tables["nodes"].shape[1]
    rt = tables["tris"].shape[1]
    grid = (n_pad // tile, n_pages)
    R = _PAGE_TILE_ROWS
    ray_spec = pl.BlockSpec((3, R, _LANES), lambda i, p: (0, i, 0),
                            memory_space=pltpu.VMEM)
    tmin_spec = pl.BlockSpec((1, R, _LANES), lambda i, p: (0, i, 0),
                             memory_space=pltpu.VMEM)
    node_spec = pl.BlockSpec((1, rn, _LANES), lambda i, p: (p, 0, 0),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((1, rt, _LANES), lambda i, p: (p, 0, 0),
                            memory_space=pltpu.VMEM)
    meta_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((R, _LANES), lambda i, p: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_paged_kernel, int(max_leaf)),
        grid=grid,
        in_specs=[ray_spec, ray_spec, tmin_spec, meta_spec, node_spec,
                  tri_spec],
        out_specs=(out_spec,) * 6,
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, _LANES), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(o_p, d_p, t_p, tables["meta"], tables["nodes"], tables["tris"])
    t, tri_local, pg, u, v, front = (x.reshape(n_pad)[:N] for x in outs)
    hit = tri_local >= 0
    tri = jnp.where(
        hit,
        tables["tri_ids"][jnp.maximum(pg, 0), jnp.maximum(tri_local, 0)],
        -1)
    t = jnp.where(hit, t, jnp.inf)
    # un-sort back to the caller's ray order
    unsort = lambda x: jnp.zeros_like(x).at[perm].set(x)
    return {"t": unsort(t), "tri": unsort(tri), "u": unsort(u),
            "v": unsort(v), "front": unsort(front > 0)}
