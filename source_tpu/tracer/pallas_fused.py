"""Fused per-bounce Pallas megakernel for analytic scenes.

Round-3 verdict #1: the wavefront tracer is LAUNCH-bound — each bounce is a
chain of ~30 small XLA kernels (intersect -> volume -> material dispatch ->
state update) whose per-launch latency dominates once HBM traffic was cut
(BASELINE.md roofline: 31% of HBM peak, ceiling 4e7 seg/s). This module
fuses ONE ENTIRE BOUNCE into a single Pallas kernel for scenes that
qualify (all-analytic simple entities, built-in material set, Beer/
homogeneous volumes), so a 24-bounce trace is ~24 launches instead of ~24
chains. Reference analogue: the whole recursive ``Ray.trace`` loop
(raysect/optical/ray.pyx:338-455 + material dispatch, SURVEY.md §3.2).

Architecture — one shared pure function, three consumers:

  * ``_bounce_core(spec, tget, state, u, bits)`` is the entire bounce as
    shape-agnostic jnp on per-lane component arrays: Russian roulette,
    static-unrolled leaf intersection (grad-safe closed forms), winner
    select, Beer-Lambert/homogeneous volumes, branchless material dispatch
    (Lambert-MIS / conductors / dielectric roulette / emitters / null),
    and the state update — estimator-identical to ``trace_step``
    (wavefront.py).
  * The FORWARD kernel calls it with ``bits=None`` — discrete decisions
    (winner leaf, dielectric transmit, MIS light pick, ...) are made
    inline and returned as a packed i32 bitfield per lane.
  * The BACKWARD kernel re-runs it under ``jax.vjp`` *inside* the Pallas
    kernel with the saved bits, producing the path-state cotangents
    (origin/direction/throughput chains) — the serial, launch-bound part
    of reverse mode — fused into one kernel per bounce.
  * Scene-TABLE cotangents need no serial chain once per-bounce entry
    states and output cotangents are known, so they are computed by ONE
    batched XLA vjp of the same ``_bounce_core`` over all (bounce, lane)
    pairs at once (``_span_bwd``), then folded into the scene pytree by
    differentiating ``pack_tabvec``.

``_span`` (custom_vjp) runs a whole compaction stage of bounces this way;
``wavefront.trace_rays``/``trace_rays_diff`` route eligible scenes here.

Round 5 adds WHOLE-SPAN kernels (``_span_fwd_call``/``_span_bwd_call``):
the bounce loop runs inside one Pallas kernel per compaction span (state
VMEM-resident, per-tile early exit, only choice bitfields touch HBM), the
backward replays the span in-kernel and chains ``jax.vjp`` in reverse,
and bounce uniforms can come from the TPU hardware PRNG
(``SOURCE_TPU_RNG=kernel``). Forward-only tracing defaults to the span
kernel; the differentiable path defaults to the per-bounce kernels —
MEASURED faster on v5e because the step is compute-bound and the span
backward pays a full forward replay (see ``span_mode``/``span_mode_diff``
and BASELINE.md round 5).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..optical.material.base import (
    MAT_ABSORBER,
    MAT_CHECKERBOARD,
    MAT_CONDUCTOR,
    MAT_DIELECTRIC,
    MAT_EMITTER,
    MAT_EMITTER_ANISO,
    MAT_LAMBERT,
    MAT_LIGHT,
    MAT_NULL,
    MAT_PERFECT_REFLECT,
    MAT_ROUGH_CONDUCTOR,
    VOL_BEER,
    VOL_HOMOGENEOUS,
)
from ..primitive.analytic import (
    TYPE_BOX,
    TYPE_CONE,
    TYPE_CYLINDER,
    TYPE_PARABOLA,
    TYPE_SPHERE,
    TYPE_TORUS,
)

__all__ = ["FusedSpec", "fused_spec", "pack_tabvec", "fused_span",
           "fused_forward_span"]

_LANES = 128
_SUB = 8
# ray rows per kernel tile: the fused kernel is pure SIMD (no packet
# traversal -> no divergence penalty), so bigger tiles just cut grid
# steps at the cost of VMEM (env-overridable for A/B tuning)
import os as _os

# NOTE (ADVICE r4): read at IMPORT time — set SOURCE_TPU_FUSED_TILE before
# importing this module (A/B harnesses: fresh process per setting). The
# span-kernel tiles (SOURCE_TPU_SPAN_TILE / _BWD_TILE) are read per trace
# via functions instead. SOURCE_TPU_FUSED / SOURCE_TPU_SPAN are read at
# TRACE time: flipping them after a jit cache hit has no effect within the
# same (scene, cfg, shape) cache entry.
TILE_ROWS = int(_os.environ.get("SOURCE_TPU_FUSED_TILE", "32"))
_TILE = _SUB * _LANES
_BIG = 3e38
_PI = 3.14159265358979323846
_T_EPS = 1e-4  # tracer/intersect.py T_EPS (relative minimum advance)

# material types the fused dispatch implements
_SUPPORTED_MATS = frozenset({
    MAT_ABSORBER, MAT_LAMBERT, MAT_EMITTER, MAT_NULL, MAT_CONDUCTOR,
    MAT_ROUGH_CONDUCTOR, MAT_DIELECTRIC, MAT_EMITTER_ANISO,
    MAT_CHECKERBOARD, MAT_LIGHT, MAT_PERFECT_REFLECT,
})
_SUPPORTED_TYPES = frozenset({
    TYPE_SPHERE, TYPE_BOX, TYPE_CYLINDER, TYPE_CONE, TYPE_PARABOLA,
    TYPE_TORUS,
})
MAX_FUSED_LEAVES = 48
MAX_FUSED_IMP = 31

# choice bitfield layout (i32 per lane per bounce)
B_ALIVE = 0        # post-roulette pre-hit alive (segments accounting)
B_HIT = 1
B_TRANSMIT = 2     # dielectric path roulette chose transmission
B_TIR = 3
B_PICKLIGHT = 4    # one-sample MIS chose the light direction
B_CONT = 5         # material continues the path
B_CNTD = 6         # bounce counts toward depth (null surfaces exempt)
B_ALIVENEXT = 7
B_EXIT = 8         # ray origin inside the winning solid ('exiting')
B_PARITY = 14      # checkerboard cell parity (cap hits sit exactly on a
                   # cell boundary, so the backward must REPLAY the
                   # forward's pick, not recompute it from floats)
LIGHT_SHIFT = 9    # 5 bits: important-sphere index
WIN_SHIFT = 16     # 9 bits: winning leaf index


@dataclasses.dataclass(frozen=True)
class FusedSpec:
    """Static codegen spec derived from a CompiledScene + RayConfig."""

    # (type_id, entity, mat_id, fast_kind) per leaf; fast_kind: 0 general
    # local-frame, 1 world sphere (rigid/uniform scale), 2 world AABB
    # (axis-permutation box) — fast records skip the 12-scalar transform
    leaves: Tuple[Tuple[int, int, int, int], ...]
    mat_types: Tuple[int, ...]                # mat id -> MAT_* code
    volumes: Tuple[Tuple[int, int, int, int], ...]  # (entity, mat, kind, leaf)
    check_entities: Tuple[int, ...]  # entities needing their own w2l rows
    n_imp: int
    has_importance: bool
    bins: int
    # RayConfig statics baked into the kernel
    max_depth: int
    extinction_prob: float
    extinction_min_depth: int
    importance_sampling: bool
    important_path_weight: float
    max_distance: float


def general_spec(spec):
    """The spec with fast records disabled (all leaves general local-frame).

    The DIFFERENTIABLE span uses this: a fast record's world-space
    expression coincides with the general one in VALUE at the compiled
    transform but is a different local extension of it, so its w2l
    cotangents differ (e.g. the world-AABB route is blind to rotation
    perturbations). Forward-only tracing keeps the fast records."""
    return dataclasses.replace(
        spec,
        leaves=tuple((t, e, m, 0) for (t, e, m, _k) in spec.leaves))


def fused_spec(scene, cfg):
    """FusedSpec for an eligible (scene, cfg), else None.

    Eligible: every entity is a simple analytic leaf of a supported type,
    every material is in the built-in closed set (no user BSDFs, mixes or
    Roughen), volumes are Beer-Lambert / homogeneous only, and counts fit
    the bitfield.
    """
    if (scene.mesh_entities or scene.csg_entities or scene.custom_materials
            or scene.mix_remaps or scene.has_roughen):
        return None
    if scene.n_leaves == 0 or scene.n_leaves > MAX_FUSED_LEAVES:
        return None
    if not scene.entity_material_static:
        return None  # scene compiled before the static map existed
    for t, _, _ in scene.type_slices:
        if t not in _SUPPORTED_TYPES:
            return None
    for mt in scene.mat_types:
        if mt not in _SUPPORTED_MATS:
            return None
    for e, leaf in enumerate(scene.simple_leaf_of_entity):
        if leaf < 0:
            return None  # non-simple entity
    vols = []
    for (e, mat_idx, kind, _obj, leaf_idx, _slot, _iv) in scene.volume_entities:
        if kind not in (VOL_BEER, VOL_HOMOGENEOUS) or leaf_idx < 0:
            return None
        vols.append((e, mat_idx, kind, leaf_idx))
    I = int(scene.imp_cdf.shape[0])
    if I > MAX_FUSED_IMP:
        return None

    # leaf type from static type slices; entity/material from static maps
    leaf_type = {}
    for t, start, stop in scene.type_slices:
        for g in range(start, stop):
            leaf_type[g] = t
    leaf_entity = {}
    for e, leaf in enumerate(scene.simple_leaf_of_entity):
        leaf_entity[leaf] = e
    if len(leaf_entity) != scene.n_leaves:
        return None
    fast = scene.leaf_fast_static or (0,) * scene.n_leaves
    leaves = []
    for g in range(scene.n_leaves):
        e = leaf_entity[g]
        leaves.append((leaf_type[g], e, scene.entity_material_static[e],
                       fast[g]))
    check_entities = tuple(sorted({
        e for (_, e, m, _k) in leaves
        if scene.mat_types[m] == MAT_CHECKERBOARD
    }))
    return FusedSpec(
        leaves=tuple(leaves),
        mat_types=tuple(scene.mat_types),
        volumes=tuple(vols),
        check_entities=check_entities,
        n_imp=I,
        has_importance=bool(scene.has_importance),
        bins=int(scene.n_bins),
        max_depth=int(cfg.max_depth),
        extinction_prob=float(cfg.extinction_prob),
        extinction_min_depth=int(cfg.extinction_min_depth),
        importance_sampling=bool(cfg.importance_sampling),
        important_path_weight=float(cfg.important_path_weight),
        max_distance=float(cfg.max_distance),
    )


# --- table vector layout ----------------------------------------------------
# Per leaf g:    20 scalars  [w2l rows 0..11 | params 0..7]
# Per material:  10+2B       [params 0..7 | n_int | n_ext | spec0[B] | spec1[B]]
# Per imp i:     6           [cx cy cz r w cdf]
# Per check ent: 12          [entity w2l rows]


def _off_leaf(spec, g):
    return g * 20


def _mat_base(spec):
    return 20 * len(spec.leaves)


def _off_mat(spec, m):
    return _mat_base(spec) + m * (10 + 2 * spec.bins)


def _imp_base(spec):
    return _mat_base(spec) + len(spec.mat_types) * (10 + 2 * spec.bins)


def _off_imp(spec, i):
    return _imp_base(spec) + 6 * i


def _check_base(spec):
    return _imp_base(spec) + 6 * spec.n_imp


def _off_check(spec, e):
    return _check_base(spec) + 12 * spec.check_entities.index(e)


def tab_size(spec):
    return _check_base(spec) + 12 * len(spec.check_entities)


def pack_tabvec(scene, spec):
    """Differentiable flat f32[T] view of the scene tables the kernel reads.

    Fast-record leaves bake WORLD-space fields (sphere centre+radius, box
    AABB) computed from inv(w2l) so cotangents still land on leaf_w2l —
    the same parameterisation the streaming path differentiates."""
    L = len(spec.leaves)
    leaf_rows = jnp.concatenate(
        [scene.leaf_w2l[:L, :3, :].reshape(L, 12), scene.leaf_params[:L]],
        axis=1)
    if any(k for (_t, _e, _m, k) in spec.leaves):
        rows = []
        for g, (_tid, _e, _m, kind) in enumerate(spec.leaves):
            if kind == 0:
                rows.append(leaf_rows[g])
                continue
            p = scene.leaf_params[g]
            if kind == 1:  # world sphere (pure translation: c = -w2l[:,3])
                c = -scene.leaf_w2l[g, :3, 3]
                row = jnp.concatenate(
                    [c, p[0][None], jnp.zeros(16, jnp.float32)])
            else:  # world AABB from the 8 transformed corners
                l2w = jnp.linalg.inv(scene.leaf_w2l[g])
                corners = jnp.stack([
                    jnp.stack([p[3 * int(x)], p[1 + 3 * int(y)],
                               p[2 + 3 * int(z)]])
                    for x in (0, 1) for y in (0, 1) for z in (0, 1)
                ])
                wc = corners @ l2w[:3, :3].T + l2w[:3, 3]
                row = jnp.concatenate(
                    [wc.min(axis=0), wc.max(axis=0),
                     jnp.zeros(14, jnp.float32)])
            rows.append(row)
        leaf_rows = jnp.stack(rows)
    parts = [leaf_rows.reshape(-1)]
    M = len(spec.mat_types)
    parts.append(
        jnp.concatenate(
            [scene.mat_params[:, :8], scene.mat_scalars[:, :2],
             scene.mat_spectra[:, 0, :], scene.mat_spectra[:, 1, :]], axis=1
        ).reshape(-1)
    )
    parts.append(
        jnp.concatenate(
            [scene.imp_centre, scene.imp_radius[:, None],
             scene.imp_weight[:, None], scene.imp_cdf[:, None]], axis=1
        ).reshape(-1)
    )
    for e in spec.check_entities:
        parts.append(scene.entity_w2l[e, :3, :].reshape(12))
    return jnp.concatenate(parts).astype(jnp.float32)


# --- gradient-safe component math -------------------------------------------


def _ssqrt(x):
    ok = x > 0.0
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, x, 1.0)), 0.0)


def _sdiv(a, b, eps=1e-30):
    ok = jnp.abs(b) > eps
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)


def _spow(base, e):
    ok = base > 0.0
    return jnp.where(ok, jnp.where(ok, base, 1.0) ** e, 0.0)


def _norm3(x, y, z):
    n2 = x * x + y * y + z * z
    ok = n2 > 1e-24
    inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, n2, 1.0)), 0.0)
    return x * inv, y * inv, z * inv


def _make_frame(nx, ny, nz):
    """Duff et al. branchless ONB — mirrors core.math.batch.make_frame
    (including its fp-noise-tolerant sign threshold, so exact-zero fast
    records and transform-produced noisy zeros choose the same frame)."""
    s = jnp.where(nz >= -1e-6, 1.0, -1.0)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    t = (1.0 + s * nx * nx * a, s * b, -s * nx)
    bt = (b, s + ny * ny * a, -ny)
    return t, bt, (nx, ny, nz)


def _from_frame(v, t, b, n):
    return (v[0] * t[0] + v[1] * b[0] + v[2] * n[0],
            v[0] * t[1] + v[1] * b[1] + v[2] * n[1],
            v[0] * t[2] + v[1] * b[2] + v[2] * n[2])


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _reflect(d, n):
    k = 2.0 * _dot3(d, n)
    return (d[0] - k * n[0], d[1] - k * n[1], d[2] - k * n[2])


def _hemisphere_cosine(u1, u2):
    z = _ssqrt(u1)
    r = _ssqrt(1.0 - u1)
    phi = 2.0 * _PI * u2
    return (r * jnp.cos(phi), r * jnp.sin(phi), z)


def _cone_uniform(u1, u2, cos_max):
    z = 1.0 - u1 * (1.0 - cos_max)
    r = _ssqrt(1.0 - z * z)
    phi = 2.0 * _PI * u2
    return (r * jnp.cos(phi), r * jnp.sin(phi), z)


# --- grad-safe nearest-positive-crossing closed forms ------------------------
# Component ports of primitive/analytic.py candidate/normal/contains
# functions (the same solids as the streaming path) with double-where
# guards so reverse mode stays NaN-free on masked/miss lanes. Each hit fn
# returns (t, inside): the smallest crossing strictly greater than t_min
# (else +_BIG) and the ray-origin containment flag (convex solids: origin
# containment == 'exiting' at the first crossing).


def _quad(a, b, c):
    disc = b * b - 4.0 * a * c
    v = disc >= 0.0
    sq = _ssqrt(disc)
    q = -0.5 * (b + jnp.where(b >= 0.0, sq, -sq))
    a_ok = jnp.abs(a) > 1e-30
    q_ok = jnp.abs(q) > 1e-30
    r0 = jnp.where(a_ok, _sdiv(q, a), _BIG)
    r1 = jnp.where(q_ok, _sdiv(c, q), r0)
    return jnp.minimum(r0, r1), jnp.maximum(r0, r1), v & a_ok


def _first_after(t_min, *cands):
    best = jnp.full_like(t_min, _BIG)
    for t, v in cands:
        take = v & (t > t_min) & (t < best)
        best = jnp.where(take, t, best)
    return best


def _hit_sphere(o, d, p, t_min):
    r = p[0]
    a = _dot3(d, d)
    b = 2.0 * _dot3(o, d)
    c = _dot3(o, o) - r * r
    lo, hi, v = _quad(a, b, c)
    return _first_after(t_min, (lo, v), (hi, v)), c < 0.0


def _n_sphere(p, pp):
    return p


def _inv_dir(x):
    ok = jnp.abs(x) > 1e-30
    return jnp.where(ok, _sdiv(1.0, x), jnp.where(x >= 0.0, _BIG, -_BIG))


def _hit_box(o, d, p, t_min):
    ix, iy, iz = _inv_dir(d[0]), _inv_dir(d[1]), _inv_dir(d[2])
    t0x = (p[0] - o[0]) * ix
    t1x = (p[3] - o[0]) * ix
    t0y = (p[1] - o[1]) * iy
    t1y = (p[4] - o[1]) * iy
    t0z = (p[2] - o[2]) * iz
    t1z = (p[5] - o[2]) * iz
    lo = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                     jnp.minimum(t0z, t1z))
    hi = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                     jnp.maximum(t0z, t1z))
    v = hi >= lo
    inside = ((o[0] >= p[0]) & (o[0] <= p[3]) & (o[1] >= p[1]) & (o[1] <= p[4])
              & (o[2] >= p[2]) & (o[2] <= p[5]))
    return _first_after(t_min, (lo, v), (hi, v)), inside


def _n_box(p, pp):
    """Smallest-distance-to-face-plane pick (analytic.normal_box rule)."""
    cx, cy, cz = 0.5 * (pp[0] + pp[3]), 0.5 * (pp[1] + pp[4]), 0.5 * (pp[2] + pp[5])
    ex, ey, ez = 0.5 * (pp[3] - pp[0]), 0.5 * (pp[4] - pp[1]), 0.5 * (pp[5] - pp[2])
    qx, qy, qz = p[0] - cx, p[1] - cy, p[2] - cz
    dx_ = jnp.abs(ex - jnp.abs(qx))
    dy_ = jnp.abs(ey - jnp.abs(qy))
    dz_ = jnp.abs(ez - jnp.abs(qz))
    on_x = (dx_ <= dy_) & (dx_ <= dz_)
    on_y = ~on_x & (dy_ <= dz_)
    on_z = ~on_x & ~on_y
    sgn = lambda q: jnp.where(q >= 0.0, 1.0, -1.0)
    return (jnp.where(on_x, sgn(qx), 0.0), jnp.where(on_y, sgn(qy), 0.0),
            jnp.where(on_z, sgn(qz), 0.0))


def _hit_cylinder(o, d, p, t_min):
    r, h = p[0], p[1]
    a = d[0] * d[0] + d[1] * d[1]
    b = 2.0 * (o[0] * d[0] + o[1] * d[1])
    c = o[0] * o[0] + o[1] * o[1] - r * r
    qlo, qhi, qv = _quad(a, b, c)
    axial = a <= 1e-20
    in_tube = c <= 0.0
    tube_lo = jnp.where(axial, jnp.where(in_tube, -_BIG, _BIG),
                        jnp.where(qv, qlo, _BIG))
    tube_hi = jnp.where(axial, jnp.where(in_tube, _BIG, -_BIG),
                        jnp.where(qv, qhi, -_BIG))
    flat = jnp.abs(d[2]) <= 1e-30
    s0 = _sdiv(0.0 - o[2], jnp.where(flat, 1e-30, d[2]), 1e-35)
    s1 = _sdiv(h - o[2], jnp.where(flat, 1e-30, d[2]), 1e-35)
    in_slab = (o[2] >= 0.0) & (o[2] <= h)
    slab_lo = jnp.where(flat, jnp.where(in_slab, -_BIG, _BIG),
                        jnp.minimum(s0, s1))
    slab_hi = jnp.where(flat, jnp.where(in_slab, _BIG, -_BIG),
                        jnp.maximum(s0, s1))
    lo = jnp.maximum(tube_lo, slab_lo)
    hi = jnp.minimum(tube_hi, slab_hi)
    v = hi >= lo
    inside = in_tube & in_slab
    return _first_after(t_min, (lo, v), (hi, v)), inside


def _n_cylinder(p, pp):
    r, h = pp[0], pp[1]
    rad = jnp.sqrt(p[0] * p[0] + p[1] * p[1] + 1e-12)
    d_side = jnp.abs(rad - r)
    d_bot = jnp.abs(p[2])
    d_top = jnp.abs(p[2] - h)
    side = (d_side <= d_bot) & (d_side <= d_top)
    bot = ~side & (d_bot <= d_top)
    top = ~side & ~bot
    return (jnp.where(side, p[0] / rad, 0.0), jnp.where(side, p[1] / rad, 0.0),
            jnp.where(bot, -1.0, jnp.where(top, 1.0, 0.0)))


def _hit_cone(o, d, p, t_min):
    r, h = p[0], p[1]
    k = _sdiv(r, h, 1e-30)
    wo = h - o[2]
    wd = -d[2]
    a = d[0] * d[0] + d[1] * d[1] - k * k * wd * wd
    b = 2.0 * (o[0] * d[0] + o[1] * d[1] - k * k * wo * wd)
    c = o[0] * o[0] + o[1] * o[1] - k * k * wo * wo
    qlo, qhi, qv = _quad(a, b, c)
    z0 = o[2] + qlo * d[2]
    z1 = o[2] + qhi * d[2]
    v0 = qv & (z0 >= 0.0) & (z0 <= h)
    v1 = qv & (z1 >= 0.0) & (z1 <= h)
    nz = jnp.abs(d[2]) > 1e-30
    tc = _sdiv(-o[2], jnp.where(nz, d[2], 1.0))
    px = o[0] + tc * d[0]
    py = o[1] + tc * d[1]
    vc = nz & (px * px + py * py <= r * r)
    lim = k * (h - o[2])
    inside = (o[2] >= 0.0) & (o[2] <= h) & (o[0] * o[0] + o[1] * o[1] <= lim * lim)
    return _first_after(t_min, (qlo, v0), (qhi, v1), (tc, vc)), inside


def _n_cone(p, pp):
    r, h = pp[0], pp[1]
    k = _sdiv(r, h, 1e-30)
    rad = jnp.sqrt(p[0] * p[0] + p[1] * p[1] + 1e-12)
    d_cap = jnp.abs(p[2])
    inv = 1.0 / jnp.sqrt(1.0 + k * k)
    d_cone = jnp.abs(rad - k * (h - p[2])) * inv
    cap = d_cap <= d_cone
    return (jnp.where(cap, 0.0, p[0] / rad * inv),
            jnp.where(cap, 0.0, p[1] / rad * inv),
            jnp.where(cap, -1.0, k * inv))


def _hit_parabola(o, d, p, t_min):
    r, h = p[0], p[1]
    a4 = _sdiv(r * r, h, 1e-30)
    a = d[0] * d[0] + d[1] * d[1]
    b = 2.0 * (o[0] * d[0] + o[1] * d[1]) + a4 * d[2]
    c = o[0] * o[0] + o[1] * o[1] + a4 * (o[2] - h)
    qlo, qhi, qv = _quad(a, b, c)
    z0 = o[2] + qlo * d[2]
    z1 = o[2] + qhi * d[2]
    v0 = qv & (z0 >= 0.0) & (z0 <= h)
    v1 = qv & (z1 >= 0.0) & (z1 <= h)
    lin = a <= 1e-20
    b_ok = jnp.abs(b) > 1e-30
    tl = _sdiv(-c, jnp.where(b_ok, b, 1.0))
    zl = o[2] + tl * d[2]
    vl = lin & b_ok & (zl >= 0.0) & (zl <= h)
    t0 = jnp.where(lin, tl, qlo)
    v0 = (lin & vl) | (~lin & v0)
    v1 = v1 & ~lin
    nz = jnp.abs(d[2]) > 1e-30
    tc = _sdiv(-o[2], jnp.where(nz, d[2], 1.0))
    px = o[0] + tc * d[0]
    py = o[1] + tc * d[1]
    vc = nz & (px * px + py * py <= r * r)
    inside = (o[2] >= 0.0) & (o[2] <= h) & (
        o[0] * o[0] + o[1] * o[1] <= a4 * (h - o[2]))
    return _first_after(t_min, (t0, v0), (qhi, v1), (tc, vc)), inside


def _n_parabola(p, pp):
    r, h = pp[0], pp[1]
    a4 = _sdiv(r * r, h, 1e-30)
    d_cap = jnp.abs(p[2])
    surf = jnp.abs(p[0] * p[0] + p[1] * p[1] + a4 * (p[2] - h))
    cap = d_cap <= surf * 0.5
    return (jnp.where(cap, 0.0, 2.0 * p[0]), jnp.where(cap, 0.0, 2.0 * p[1]),
            jnp.where(cap, -1.0, a4))


# --- torus quartic (component form of core.math.polyroots.solve_quartic,
# VERDICT r4 next #5: the torus joins the fused kernel's inline types) -------


def _quartic_first(a, b, c, d, e, t_min, newton_iters=3):
    """Smallest real root > t_min of the quartic — via the SHARED
    component-form Ferrari solver (core/math/polyroots.
    solve_quartic_components), the same fp route as the streaming path's
    ``solve_quartic``, so kernel and streaming torus hits agree
    bit-for-bit."""
    from ..core.math.polyroots import solve_quartic_components

    pairs = solve_quartic_components(a, b, c, d, e, newton_iters)
    return _first_after(t_min, *pairs)


def _hit_torus(o, d, p, t_min):
    """Z-axis torus, major/minor radii p[0]/p[1] (torus.pyx:46 quartic)."""
    R, r = p[0], p[1]
    dd = _dot3(d, d)
    od = _dot3(o, d)
    oo = _dot3(o, o)
    k = oo - r * r - R * R
    a4 = dd * dd
    a3 = 4.0 * dd * od
    a2 = 2.0 * dd * k + 4.0 * od * od + 4.0 * R * R * d[2] * d[2]
    a1 = 4.0 * k * od + 8.0 * R * R * o[2] * d[2]
    a0 = k * k - 4.0 * R * R * (r * r - o[2] * o[2])
    from ..core.math.polyroots import solve_quartic_components
    from ..primitive.analytic import torus_root_valid

    pairs = []
    for (t_r, v) in solve_quartic_components(a4, a3, a2, a1, a0,
                                             newton_iters=3):
        ts = jnp.where(v, t_r, 0.0)
        px = o[0] + ts * d[0]
        py = o[1] + ts * d[1]
        pz = o[2] + ts * d[2]
        # same plug-back pseudo-root filter (identical fp ops) as the
        # streaming candidates_torus
        pairs.append((t_r, v & torus_root_valid(ts, px, py, pz, R, r)))
    t = _first_after(t_min, *pairs)
    rad = jnp.sqrt(o[0] * o[0] + o[1] * o[1] + 1e-12)
    inside = (rad - R) * (rad - R) + o[2] * o[2] <= r * r
    return t, inside


def _n_torus(p, pp):
    """Gradient direction toward the nearest spine-circle point
    (analytic.normal_torus); normalised by the caller's _norm3."""
    R = pp[0]
    rad = jnp.sqrt(p[0] * p[0] + p[1] * p[1] + 1e-12)
    return (p[0] - p[0] / rad * R, p[1] - p[1] / rad * R, p[2])


def _contains(tid, p, pp):
    if tid == TYPE_TORUS:
        R, r = pp[0], pp[1]
        rad = jnp.sqrt(p[0] * p[0] + p[1] * p[1] + 1e-12)
        return (rad - R) * (rad - R) + p[2] * p[2] <= r * r
    if tid == TYPE_SPHERE:
        return _dot3(p, p) <= pp[0] * pp[0]
    if tid == TYPE_BOX:
        return ((p[0] >= pp[0]) & (p[0] <= pp[3]) & (p[1] >= pp[1])
                & (p[1] <= pp[4]) & (p[2] >= pp[2]) & (p[2] <= pp[5]))
    if tid == TYPE_CYLINDER:
        return ((p[0] * p[0] + p[1] * p[1] <= pp[0] * pp[0])
                & (p[2] >= 0.0) & (p[2] <= pp[1]))
    if tid == TYPE_CONE:
        k = _sdiv(pp[0], pp[1], 1e-30)
        lim = k * (pp[1] - p[2])
        return ((p[2] >= 0.0) & (p[2] <= pp[1])
                & (p[0] * p[0] + p[1] * p[1] <= lim * lim))
    if tid == TYPE_PARABOLA:
        a4 = _sdiv(pp[0] * pp[0], pp[1], 1e-30)
        return (p[2] >= 0.0) & (p[0] * p[0] + p[1] * p[1] <= a4 * (pp[1] - p[2]))
    raise ValueError(f"unsupported type {tid}")


_HIT = {TYPE_SPHERE: _hit_sphere, TYPE_BOX: _hit_box,
        TYPE_CYLINDER: _hit_cylinder, TYPE_CONE: _hit_cone,
        TYPE_PARABOLA: _hit_parabola, TYPE_TORUS: _hit_torus}
_NORMAL = {TYPE_SPHERE: _n_sphere, TYPE_BOX: _n_box,
           TYPE_CYLINDER: _n_cylinder, TYPE_CONE: _n_cone,
           TYPE_PARABOLA: _n_parabola, TYPE_TORUS: _n_torus}


def _conductor_fresnel(ci, n, k):
    """Spectral conducting Fresnel (conductor.pyx:77-149); scalar per bin."""
    ci2 = ci * ci
    n2k2 = n * n + k * k
    two_n_ci = 2.0 * n * ci
    rs = (n2k2 - two_n_ci + ci2) / jnp.maximum(n2k2 + two_n_ci + ci2, 1e-30)
    rp = (n2k2 * ci2 - two_n_ci + 1.0) / jnp.maximum(
        n2k2 * ci2 + two_n_ci + 1.0, 1e-30)
    return 0.5 * (rs + rp)


# --- the bounce --------------------------------------------------------------


def _leaf_local(tget, off, o, d):
    """Ray into a leaf frame via the 12 w2l row scalars at ``off``."""
    m = [tget(off + k) for k in range(12)]
    lo = (m[0] * o[0] + m[1] * o[1] + m[2] * o[2] + m[3],
          m[4] * o[0] + m[5] * o[1] + m[6] * o[2] + m[7],
          m[8] * o[0] + m[9] * o[1] + m[10] * o[2] + m[11])
    ld = (m[0] * d[0] + m[1] * d[1] + m[2] * d[2],
          m[4] * d[0] + m[5] * d[1] + m[6] * d[2],
          m[8] * d[0] + m[9] * d[1] + m[10] * d[2])
    return m, lo, ld


def _bit(bits, k):
    return ((bits >> k) & 1) > 0


def _bool_to_bit(m, k):
    return m.astype(jnp.int32) << k


def _bounce_core(spec: FusedSpec, tget, state, u, bits):
    """One full wavefront bounce; estimator-identical to
    ``wavefront.trace_step`` for the supported scene class.

    state: dict(o=(x,y,z), d=(x,y,z), thr=tuple[B], alive=bool, depth=f32)
    u:     tuple of 10 per-lane uniform draws
    bits:  None (forward: make decisions inline) or the saved i32 bitfield
           (backward: replay the forward's discrete choices).
    Returns dict(o, d, thr, rad_delta, alive_next, depth, bits).
    """
    B = spec.bins
    L = len(spec.leaves)
    o, d = state["o"], state["d"]
    thr = list(state["thr"])
    alive_in = state["alive"]
    depth = state["depth"]

    def dec(computed, bitpos):
        """Discrete decision: inline in forward, replayed in backward."""
        if bits is None:
            return computed
        return _bit(bits, bitpos)

    # --- Russian roulette (optical/ray.pyx:380-388) --------------------------
    p_ext = spec.extinction_prob
    roulette_active = alive_in & (depth >= spec.extinction_min_depth)
    killed = roulette_active & (u[6] < p_ext)
    survive_scale = jnp.where(roulette_active & ~killed,
                              1.0 / (1.0 - p_ext), 1.0)
    alive = alive_in & ~killed & (depth < spec.max_depth)
    thr = [t * survive_scale for t in thr]

    # --- intersection: static leaf unroll ------------------------------------
    eps = _T_EPS * jnp.maximum(
        1.0, jnp.maximum(jnp.abs(o[0]), jnp.maximum(jnp.abs(o[1]),
                                                    jnp.abs(o[2]))))
    t_leaf = []
    ins_leaf = []
    nrm_leaf = []
    for g, (tid, _e, _m, kind) in enumerate(spec.leaves):
        off = _off_leaf(spec, g)
        if kind == 1:
            # world sphere: 4 scalars, no transforms
            c = (tget(off), tget(off + 1), tget(off + 2))
            r = tget(off + 3)
            p0 = (o[0] - c[0], o[1] - c[1], o[2] - c[2])
            a = _dot3(d, d)
            b = 2.0 * _dot3(p0, d)
            cc = _dot3(p0, p0) - r * r
            lo_t, hi_t, v = _quad(a, b, cc)
            t_g = _first_after(eps, (lo_t, v), (hi_t, v))
            ins_g = cc < 0.0
            t_s = jnp.where(t_g < 1e30, t_g, 0.0)
            nw = (p0[0] + t_s * d[0], p0[1] + t_s * d[1], p0[2] + t_s * d[2])
        elif kind == 2:
            # world AABB: 6 scalars, slab test + face pick in world space
            pp = [tget(off + k) for k in range(6)]
            t_g, ins_g = _hit_box(o, d, pp, eps)
            t_s = jnp.where(t_g < 1e30, t_g, 0.0)
            pw = (o[0] + t_s * d[0], o[1] + t_s * d[1], o[2] + t_s * d[2])
            nw = _n_box(pw, pp)
        else:
            m12, lo, ld = _leaf_local(tget, off, o, d)
            pp = [tget(off + 12 + k) for k in range(8)]
            t_g, ins_g = _HIT[tid](lo, ld, pp, eps)
            # sanitize miss lanes before the hit-point/normal math (BIG * d
            # overflows to inf and would NaN-poison the vjp through the
            # select)
            t_s = jnp.where(t_g < 1e30, t_g, 0.0)
            # local hit point as w2l·(world hit point) — the same float
            # path as the streaming tracer (intersect.py point ->
            # transform_point), so ill-conditioned face picks on degenerate
            # thin boxes resolve the same way in both paths
            pw = (o[0] + t_s * d[0], o[1] + t_s * d[1], o[2] + t_s * d[2])
            ph = (m12[0] * pw[0] + m12[1] * pw[1] + m12[2] * pw[2] + m12[3],
                  m12[4] * pw[0] + m12[5] * pw[1] + m12[6] * pw[2] + m12[7],
                  m12[8] * pw[0] + m12[9] * pw[1] + m12[10] * pw[2] + m12[11])
            nl = _NORMAL[tid](ph, pp)
            # local -> world normal via (w2l)^T (inverse-transpose)
            nw = (m12[0] * nl[0] + m12[4] * nl[1] + m12[8] * nl[2],
                  m12[1] * nl[0] + m12[5] * nl[1] + m12[9] * nl[2],
                  m12[2] * nl[0] + m12[6] * nl[1] + m12[10] * nl[2])
        t_leaf.append((t_g, t_s))
        ins_leaf.append(ins_g)
        nrm_leaf.append(nw)

    if bits is None:
        t_best = jnp.full_like(o[0], _BIG)
        win = jnp.zeros_like(o[0], dtype=jnp.int32)
        for g in range(L):
            better = t_leaf[g][0] < t_best
            t_best = jnp.where(better, t_leaf[g][0], t_best)
            win = jnp.where(better, jnp.int32(g), win)
        hit = t_best < 1e30
        if spec.max_distance != float("inf"):
            hit = hit & (t_best <= spec.max_distance)
    else:
        win = (bits >> WIN_SHIFT) & 0x1FF
        hit = _bit(bits, B_HIT)

    # one-hot winner combine (differentiable value select over the static
    # leaf loop; only the winner's test contributes cotangents)
    t_sel = jnp.zeros_like(o[0])
    ins_sel = jnp.zeros_like(alive)
    nwx = jnp.zeros_like(o[0])
    nwy = jnp.zeros_like(o[0])
    nwz = jnp.zeros_like(o[0])
    for g in range(L):
        mg = win == g
        t_sel = jnp.where(mg, t_leaf[g][1], t_sel)
        # boolean algebra, not select: Mosaic rejects vector selects on i1
        ins_sel = (mg & ins_leaf[g]) | (~mg & ins_sel)
        nwx = jnp.where(mg, nrm_leaf[g][0], nwx)
        nwy = jnp.where(mg, nrm_leaf[g][1], nwy)
        nwz = jnp.where(mg, nrm_leaf[g][2], nwz)
    t_safe = jnp.where(hit, t_sel, 0.0)
    nwx, nwy, nwz = _norm3(nwx, nwy, nwz)
    exiting = dec(ins_sel, B_EXIT)
    # orient outward-away-from-solid (intersect.py flip rule)
    ddn = d[0] * nwx + d[1] * nwy + d[2] * nwz
    # boolean algebra, not select: Mosaic rejects vector selects on i1
    flip = (exiting & (ddn < 0.0)) | (~exiting & (ddn > 0.0))
    fs = jnp.where(flip, -1.0, 1.0)
    n = (nwx * fs, nwy * fs, nwz * fs)

    point = (o[0] + t_safe * d[0], o[1] + t_safe * d[1], o[2] + t_safe * d[2])
    off_p = _T_EPS * jnp.maximum(
        1.0, jnp.maximum(jnp.abs(point[0]),
                         jnp.maximum(jnp.abs(point[1]), jnp.abs(point[2]))))
    outside_p = (point[0] + n[0] * off_p, point[1] + n[1] * off_p,
                 point[2] + n[2] * off_p)
    inside_p = (point[0] - n[0] * off_p, point[1] - n[1] * off_p,
                point[2] - n[2] * off_p)

    # --- volume stage (optical/ray.pyx:422-455) ------------------------------
    t_seg = t_safe
    rad_delta = [jnp.zeros_like(o[0]) for _ in range(B)]
    if spec.volumes:
        mid = (o[0] + 0.5 * t_seg * d[0], o[1] + 0.5 * t_seg * d[1],
               o[2] + 0.5 * t_seg * d[2])
        vol_em = [jnp.zeros_like(o[0]) for _ in range(B)]
        thr_v = list(thr)
        for (_e, mat, kind, leaf) in spec.volumes:
            tid = spec.leaves[leaf][0]
            fastk = spec.leaves[leaf][3]
            offl = _off_leaf(spec, leaf)
            if fastk == 1:  # world sphere containment
                cx, cy, cz = tget(offl), tget(offl + 1), tget(offl + 2)
                r = tget(offl + 3)
                dx_ = mid[0] - cx
                dy_ = mid[1] - cy
                dz_ = mid[2] - cz
                inside_v = dx_ * dx_ + dy_ * dy_ + dz_ * dz_ <= r * r
            elif fastk == 2:  # world AABB containment
                pp = [tget(offl + k) for k in range(6)]
                inside_v = _contains(TYPE_BOX, mid, pp)
            else:
                m12 = [tget(offl + k) for k in range(12)]
                pl_ = (m12[0] * mid[0] + m12[1] * mid[1]
                       + m12[2] * mid[2] + m12[3],
                       m12[4] * mid[0] + m12[5] * mid[1]
                       + m12[6] * mid[2] + m12[7],
                       m12[8] * mid[0] + m12[9] * mid[1]
                       + m12[10] * mid[2] + m12[11])
                pp = [tget(offl + 12 + k) for k in range(8)]
                inside_v = _contains(tid, pl_, pp)
            # gate on alive too: the XLA path parks dead lanes (guaranteed
            # miss) — alive-gating reproduces that without the parking
            m = inside_v & hit & alive
            mo = _off_mat(spec, mat)
            if kind == VOL_BEER:
                for b in range(B):
                    base = tget(mo + 10 + B + b)  # slot1: transmission
                    ok = base > 1e-9
                    att = jnp.where(ok, _spow(base, t_seg), 0.0)
                    thr_v[b] = jnp.where(m, thr_v[b] * att, thr_v[b])
            else:  # VOL_HOMOGENEOUS
                for b in range(B):
                    spec0 = tget(mo + 10 + b)
                    vol_em[b] = vol_em[b] + jnp.where(m, spec0 * t_seg, 0.0)
        for b in range(B):
            rad_delta[b] = rad_delta[b] + jnp.where(
                alive, thr[b] * vol_em[b], 0.0)
        thr = thr_v

    # --- surface stage (wavefront._surface_interaction) ----------------------
    cos_in = -ddn * fs  # -d . n with the oriented normal
    front = cos_in >= 0.0
    abs_cos_in = jnp.abs(cos_in)
    n_sh = (jnp.where(front, n[0], -n[0]), jnp.where(front, n[1], -n[1]),
            jnp.where(front, n[2], -n[2]))
    t_f, b_f, n_f = _make_frame(*n_sh)
    refl_origin = tuple(jnp.where(front, outside_p[c], inside_p[c])
                        for c in range(3))
    trans_origin = tuple(jnp.where(front, inside_p[c], outside_p[c])
                         for c in range(3))

    new_o = list(refl_origin)
    new_d = list(d)
    thr_mul = [jnp.zeros_like(o[0]) for _ in range(B)]
    emission = [jnp.zeros_like(o[0]) for _ in range(B)]
    continues = jnp.zeros_like(alive)
    counts_depth = jnp.ones_like(alive)

    # branch masks per material TYPE over the static winner->material map;
    # spectral rows resolve per member material id inside the branch
    by_type = {}
    for g, (_tid, _e, mid, _k) in enumerate(spec.leaves):
        by_type.setdefault(spec.mat_types[mid], {}).setdefault(mid, []).append(g)

    def type_mask(members):
        m = jnp.zeros_like(alive)
        for mid, gs in members.items():
            for g in gs:
                m = m | (win == g)
        return m

    def mat_scalar(members, offset_fn):
        """Per-lane table scalar resolved across the branch's material ids."""
        v = jnp.zeros_like(o[0])
        for mid, gs in members.items():
            mm = jnp.zeros_like(alive)
            for g in gs:
                mm = mm | (win == g)
            v = jnp.where(mm, tget(offset_fn(mid)), v)
        return v

    # --- MIS shared precompute (world.pyx:134-253) ---------------------------
    use_mis = spec.importance_sampling and spec.has_importance
    needs_mis = use_mis and any(
        spec.mat_types[mid] in (MAT_LAMBERT, MAT_ROUGH_CONDUCTOR)
        for (_t, _e, mid, _k) in spec.leaves)
    if needs_mis:
        I = spec.n_imp
        axes = []
        cms = []
        wgts = []
        cdfs = []
        for i in range(I):
            oi = _off_imp(spec, i)
            cx, cy, cz = tget(oi), tget(oi + 1), tget(oi + 2)
            r = tget(oi + 3)
            tx = cx - point[0]
            ty = cy - point[1]
            tz = cz - point[2]
            dist2 = tx * tx + ty * ty + tz * tz
            dist = jnp.sqrt(dist2 + 1e-12)
            ax = (tx / dist, ty / dist, tz / dist)
            inside_s = dist <= r
            sin2 = jnp.clip(_sdiv(r, dist) ** 2, 0.0, 1.0)
            c2 = 1.0 - sin2
            cm = jnp.where(c2 > 0.0, _ssqrt(c2), 0.0)
            cm = jnp.where(inside_s, -1.0, cm)
            axes.append(ax)
            cms.append(cm)
            wgts.append(tget(oi + 4))
            cdfs.append(tget(oi + 5))
        # cdf pick (searchsorted 'left' == count of cdf entries < u)
        if bits is None:
            lidx = jnp.zeros_like(win)
            for i in range(I):
                lidx = lidx + (cdfs[i] < u[3]).astype(jnp.int32)
            lidx = jnp.clip(lidx, 0, I - 1)
        else:
            lidx = (bits >> LIGHT_SHIFT) & 0x1F
        ax_s = [jnp.zeros_like(o[0]) for _ in range(3)]
        cm_s = jnp.zeros_like(o[0])
        for i in range(I):
            mi = lidx == i
            for c in range(3):
                ax_s[c] = jnp.where(mi, axes[i][c], ax_s[c])
            cm_s = jnp.where(mi, cms[i], cm_s)
        local = _cone_uniform(u[4], u[5], cm_s)
        lt, lb, ln = _make_frame(*ax_s)
        dir_light = _from_frame(local, lt, lb, ln)

        def light_pdf(wo):
            pdf = jnp.zeros_like(o[0])
            for i in range(I):
                c = _dot3(axes[i], wo)
                solid = 2.0 * _PI * (1.0 - cms[i])
                pdf_i = jnp.where(c >= cms[i],
                                  _sdiv(1.0, jnp.maximum(solid, 1e-12)), 0.0)
                pdf = pdf + wgts[i] * pdf_i
            return pdf

        pick_light = dec(u[0] < spec.important_path_weight, B_PICKLIGHT)
    else:
        lidx = jnp.zeros_like(win)
        pick_light = jnp.zeros_like(alive)
        dir_light = (jnp.zeros_like(o[0]),) * 3
        light_pdf = None

    transmit = jnp.zeros_like(alive)
    tir_out = jnp.zeros_like(alive)
    check_parity = jnp.zeros_like(alive)

    present = {spec.mat_types[mid] for (_t, _e, mid, _k) in spec.leaves}

    # --- emitters (terminal) -------------------------------------------------
    if MAT_EMITTER in present:
        mem = by_type[MAT_EMITTER]
        m = type_mask(mem)
        for b in range(B):
            s0 = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 10 + b)
            emission[b] = jnp.where(m, s0, emission[b])
    if MAT_EMITTER_ANISO in present:
        mem = by_type[MAT_EMITTER_ANISO]
        m = type_mask(mem)
        power = mat_scalar(mem, lambda mid: _off_mat(spec, mid))
        base = jnp.maximum(abs_cos_in, 1e-9)
        factor = _spow(base, power)
        for b in range(B):
            s0 = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 10 + b)
            emission[b] = jnp.where(m, s0 * factor, emission[b])
    if MAT_CHECKERBOARD in present:
        mem = by_type[MAT_CHECKERBOARD]
        m = type_mask(mem)
        width = jnp.maximum(
            mat_scalar(mem, lambda mid: _off_mat(spec, mid)), 1e-12)
        # per-entity local frame (checkerboard.pyx:39 pattern frame)
        plx = jnp.zeros_like(o[0])
        ply = jnp.zeros_like(o[0])
        plz = jnp.zeros_like(o[0])
        for mid, gs in mem.items():
            for g in gs:
                e = spec.leaves[g][1]
                oc = _off_check(spec, e)
                mw = [tget(oc + k) for k in range(12)]
                mg = win == g
                plx = jnp.where(mg, mw[0] * point[0] + mw[1] * point[1]
                                + mw[2] * point[2] + mw[3], plx)
                ply = jnp.where(mg, mw[4] * point[0] + mw[5] * point[1]
                                + mw[6] * point[2] + mw[7], ply)
                plz = jnp.where(mg, mw[8] * point[0] + mw[9] * point[1]
                                + mw[10] * point[2] + mw[11], plz)
        cells = (jnp.floor(plx / width).astype(jnp.int32)
                 + jnp.floor(ply / width).astype(jnp.int32)
                 + jnp.floor(plz / width).astype(jnp.int32))
        parity = dec(cells % 2 == 0, B_PARITY)
        check_parity = parity
        for b in range(B):
            s0 = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 10 + b)
            s1 = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 10 + B + b)
            emission[b] = jnp.where(m, jnp.where(parity, s0, s1), emission[b])
    if MAT_LIGHT in present:
        mem = by_type[MAT_LIGHT]
        m = type_mask(mem)
        lx = mat_scalar(mem, lambda mid: _off_mat(spec, mid))
        ly = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 1)
        lz = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 2)
        fac = jnp.maximum(0.0, -(lx * n_sh[0] + ly * n_sh[1] + lz * n_sh[2]))
        for b in range(B):
            s0 = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 10 + b)
            emission[b] = jnp.where(m, s0 * fac, emission[b])

    if MAT_PERFECT_REFLECT in present:
        m = type_mask(by_type[MAT_PERFECT_REFLECT])
        rdir = _reflect(d, n_sh)
        for b in range(B):
            thr_mul[b] = jnp.where(m, 1.0, thr_mul[b])
        for c in range(3):
            new_d[c] = jnp.where(m, rdir[c], new_d[c])
            new_o[c] = jnp.where(m, refl_origin[c], new_o[c])
        continues = continues | m

    if MAT_NULL in present:
        m = type_mask(by_type[MAT_NULL])
        continues = continues | m
        counts_depth = counts_depth & ~m
        for c in range(3):
            new_o[c] = jnp.where(m, trans_origin[c], new_o[c])
        for b in range(B):
            thr_mul[b] = jnp.where(m, 1.0, thr_mul[b])

    if MAT_LAMBERT in present:
        mem = by_type[MAT_LAMBERT]
        m = type_mask(mem)
        dir_bsdf = _from_frame(_hemisphere_cosine(u[1], u[2]), t_f, b_f, n_f)
        if use_mis:
            w_imp = spec.important_path_weight
            out_dir = tuple(jnp.where(pick_light, dir_light[c], dir_bsdf[c])
                            for c in range(3))
            pdf_light = light_pdf(out_dir)
            cos_out = _dot3(out_dir, n_sh)
            pdf_bsdf = jnp.maximum(cos_out, 0.0) / _PI
            pdf = w_imp * pdf_light + (1.0 - w_imp) * pdf_bsdf
        else:
            out_dir = dir_bsdf
            cos_out = _dot3(out_dir, n_sh)
            pdf_bsdf = jnp.maximum(cos_out, 0.0) / _PI
            pdf = pdf_bsdf
        ok = m & (pdf > 1e-9) & (cos_out > 0.0)
        w_l = jnp.where(ok, pdf_bsdf / jnp.maximum(pdf, 1e-12), 0.0)
        for b in range(B):
            s0 = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 10 + b)
            thr_mul[b] = jnp.where(m, s0 * w_l, thr_mul[b])
        for c in range(3):
            new_d[c] = jnp.where(m, out_dir[c], new_d[c])
            new_o[c] = jnp.where(m, refl_origin[c], new_o[c])
        continues = continues | ok

    if MAT_CONDUCTOR in present:
        mem = by_type[MAT_CONDUCTOR]
        m = type_mask(mem)
        rdir = _reflect(d, n_sh)
        for b in range(B):
            nb = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 10 + b)
            kb = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 10 + B + b)
            f = _conductor_fresnel(abs_cos_in, nb, kb)
            thr_mul[b] = jnp.where(m, f, thr_mul[b])
        for c in range(3):
            new_d[c] = jnp.where(m, rdir[c], new_d[c])
            new_o[c] = jnp.where(m, refl_origin[c], new_o[c])
        continues = continues | m

    if MAT_ROUGH_CONDUCTOR in present:
        mem = by_type[MAT_ROUGH_CONDUCTOR]
        m = type_mask(mem)
        rough = jnp.clip(mat_scalar(mem, lambda mid: _off_mat(spec, mid)),
                         1e-3, 1.0)
        a2 = rough * rough
        phi = 2.0 * _PI * u[2]
        ct2 = jnp.clip(_sdiv(1.0 - u[1],
                             jnp.maximum(1.0 + (a2 - 1.0) * u[1], 1e-12)),
                       0.0, 1.0)
        ct = jnp.sqrt(ct2 + 1e-12)
        st = jnp.sqrt(jnp.clip(1.0 - ct2, 1e-12, 1.0))
        h_local = (st * jnp.cos(phi), st * jnp.sin(phi), ct)
        h_bsdf = _from_frame(h_local, t_f, b_f, n_f)
        wi = (-d[0], -d[1], -d[2])
        wo_bsdf = _reflect(d, h_bsdf)
        if use_mis:
            w_imp = spec.important_path_weight
            wo = tuple(jnp.where(pick_light, dir_light[c], wo_bsdf[c])
                       for c in range(3))
        else:
            wo = wo_bsdf
        h_raw = (wi[0] + wo[0], wi[1] + wo[1], wi[2] + wo[2])
        h_len = jnp.sqrt(jnp.maximum(_dot3(h_raw, h_raw), 1e-24))
        h = (h_raw[0] / h_len, h_raw[1] / h_len, h_raw[2] / h_len)
        ct_i = jnp.maximum(_dot3(wi, n_sh), 1e-6)
        ct_o = _dot3(wo, n_sh)
        ct_h = _dot3(h, n_sh)
        o_dot_h = _dot3(wo, h)
        dd = ct_h * ct_h * (a2 - 1.0) + 1.0
        d_ggx = a2 / jnp.maximum(_PI * dd * dd, 1e-12)
        pdf_bsdf = 0.25 * d_ggx * jnp.abs(
            ct_h / jnp.where(jnp.abs(o_dot_h) > 1e-9, o_dot_h, 1e-9))
        if use_mis:
            pdf_light = light_pdf(wo)
            pdf = (spec.important_path_weight * pdf_light
                   + (1.0 - spec.important_path_weight) * pdf_bsdf)
        else:
            pdf = pdf_bsdf
        ok = m & (ct_o > 1e-6) & (pdf > 1e-9)

        def g1(c):
            return 2.0 * c / jnp.maximum(
                c + jnp.sqrt(a2 + (1.0 - a2) * c * c), 1e-12)

        g_s = g1(ct_i) * g1(jnp.maximum(ct_o, 1e-6))
        w_spec = jnp.where(
            ok, d_ggx * g_s / (4.0 * ct_i * jnp.maximum(pdf, 1e-12)), 0.0)
        aoh = jnp.abs(o_dot_h)
        for b in range(B):
            nb = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 10 + b)
            kb = mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 10 + B + b)
            f = _conductor_fresnel(aoh, nb, kb)
            thr_mul[b] = jnp.where(m, f * w_spec, thr_mul[b])
        for c in range(3):
            new_d[c] = jnp.where(m, wo[c], new_d[c])
            new_o[c] = jnp.where(m, refl_origin[c], new_o[c])
        continues = continues | ok

    if MAT_DIELECTRIC in present:
        mem = by_type[MAT_DIELECTRIC]
        m = type_mask(mem)
        n_int = jnp.where(
            m, jnp.maximum(mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 8),
                           1e-3), 1.5)
        n_ext = jnp.where(
            m, jnp.maximum(mat_scalar(mem, lambda mid: _off_mat(spec, mid) + 9),
                           1e-3), 1.0)
        trans_only = mat_scalar(mem, lambda mid: _off_mat(spec, mid)) > 0.5
        c1 = cos_in
        entering = c1 >= 0.0
        n1 = jnp.where(entering, n_ext, n_int)
        n2 = jnp.where(entering, n_int, n_ext)
        gamma = n1 / n2
        c2s = 1.0 - gamma * gamma * (1.0 - c1 * c1)
        tir = c2s <= 0.0
        sq = jnp.where(~tir, _ssqrt(c2s), 0.0)
        temp_t = jnp.where(entering, gamma * c1 - sq, gamma * c1 + sq)
        td = _norm3(gamma * d[0] + temp_t * n[0],
                    gamma * d[1] + temp_t * n[1],
                    gamma * d[2] + temp_t * n[2])
        rdir = _reflect(d, n)
        c2 = -_dot3(n, td)
        den1 = n1 * c1 + n2 * c2
        den2 = n1 * c2 + n2 * c1
        r1 = (n1 * c1 - n2 * c2) / jnp.where(jnp.abs(den1) > 1e-12, den1, 1e-12)
        r2 = (n1 * c2 - n2 * c1) / jnp.where(jnp.abs(den2) > 1e-12, den2, 1e-12)
        reflectivity = 0.5 * (r1 * r1 + r2 * r2)
        tr = dec(trans_only | (u[0] < (1.0 - reflectivity)), B_TRANSMIT)
        tir = dec(tir, B_TIR)
        tr = tr & ~tir
        dead_tir = tir & trans_only
        ok = m & ~dead_tir
        for b in range(B):
            thr_mul[b] = jnp.where(m, jnp.where(ok, 1.0, 0.0), thr_mul[b])
        for c in range(3):
            od = jnp.where(tr, td[c], rdir[c])
            oo = jnp.where(tr, trans_origin[c], refl_origin[c])
            new_d[c] = jnp.where(m, od, new_d[c])
            new_o[c] = jnp.where(m, oo, new_o[c])
        continues = continues | ok
        transmit = tr
        tir_out = tir

    continues = dec(continues, B_CONT)
    counts_depth = dec(counts_depth, B_CNTD)

    # --- state update (trace_step tail) --------------------------------------
    active = alive & hit
    for b in range(B):
        rad_delta[b] = rad_delta[b] + jnp.where(
            active, thr[b] * emission[b], 0.0)
        thr[b] = jnp.where(active, thr[b] * thr_mul[b], thr[b])
    thr_max = thr[0]
    for b in range(1, B):
        thr_max = jnp.maximum(thr_max, thr[b])
    alive_next = dec(active & continues & (thr_max > 0.0), B_ALIVENEXT)
    out_o = tuple(jnp.where(active, new_o[c], o[c]) for c in range(3))
    out_d = tuple(jnp.where(active, new_d[c], d[c]) for c in range(3))
    depth_next = depth + jnp.where(active & counts_depth, 1.0, 0.0)

    out_bits = (
        _bool_to_bit(alive, B_ALIVE)
        | _bool_to_bit(hit, B_HIT)
        | _bool_to_bit(transmit, B_TRANSMIT)
        | _bool_to_bit(tir_out, B_TIR)
        | _bool_to_bit(pick_light, B_PICKLIGHT)
        | _bool_to_bit(continues, B_CONT)
        | _bool_to_bit(counts_depth, B_CNTD)
        | _bool_to_bit(alive_next, B_ALIVENEXT)
        | _bool_to_bit(ins_sel, B_EXIT)
        | _bool_to_bit(check_parity, B_PARITY)
        | (lidx << LIGHT_SHIFT)
        | (win << WIN_SHIFT)
    )
    return {
        "o": out_o,
        "d": out_d,
        "thr": tuple(thr),
        "rad_delta": tuple(rad_delta),
        "alive_next": alive_next,
        "depth": depth_next,
        "bits": out_bits,
    }


# --- lane packing -----------------------------------------------------------


def _rows_for(n):
    r = -(-n // _LANES)
    return -(-r // TILE_ROWS) * TILE_ROWS


def pack_multi(x):
    """[N, C] -> f32[C, R, 128] (zero-padded)."""
    N, C = x.shape
    R = _rows_for(N)
    xt = jnp.transpose(x.astype(jnp.float32))
    xt = jnp.pad(xt, ((0, 0), (0, R * _LANES - N)))
    return xt.reshape(C, R, _LANES)


def unpack_multi(x, n):
    """f32[C, R, 128] -> [N, C]."""
    C = x.shape[0]
    return jnp.transpose(x.reshape(C, -1)[:, :n])


def _vm(block):
    return pl.BlockSpec(block, lambda i: (0, i, 0), memory_space=pltpu.VMEM)


def _lane_spec():
    return pl.BlockSpec((TILE_ROWS, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _interpret():
    return jax.default_backend() != "tpu"


# --- forward kernel ---------------------------------------------------------


def _fwd_kernel(spec, tab_ref, o_ref, d_ref, thr_ref, rad_ref, aux_ref, u_ref,
                o_out, d_out, thr_out, rad_out, aux_out, bits_out):
    B = spec.bins
    tget = lambda k: tab_ref[k]
    state = {
        "o": (o_ref[0], o_ref[1], o_ref[2]),
        "d": (d_ref[0], d_ref[1], d_ref[2]),
        "thr": tuple(thr_ref[b] for b in range(B)),
        "alive": aux_ref[0] > 0.5,
        "depth": aux_ref[1],
    }
    u = tuple(u_ref[k] for k in range(10))
    out = _bounce_core(spec, tget, state, u, None)
    for c in range(3):
        o_out[c] = out["o"][c]
        d_out[c] = out["d"][c]
    for b in range(B):
        thr_out[b] = out["thr"][b]
        rad_out[b] = rad_ref[b] + out["rad_delta"][b]
    aux_out[0] = jnp.where(out["alive_next"], 1.0, 0.0)
    aux_out[1] = out["depth"]
    bits_out[...] = out["bits"]


@functools.partial(jax.jit, static_argnums=(0,))
def _bounce_fwd_call(spec, tabvec, st, u_t):
    B = spec.bins
    R = st["o"].shape[1]
    grid = R // TILE_ROWS
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _vm((3, TILE_ROWS, _LANES)), _vm((3, TILE_ROWS, _LANES)),
                  _vm((B, TILE_ROWS, _LANES)), _vm((B, TILE_ROWS, _LANES)),
                  _vm((2, TILE_ROWS, _LANES)), _vm((10, TILE_ROWS, _LANES))],
        out_specs=(_vm((3, TILE_ROWS, _LANES)), _vm((3, TILE_ROWS, _LANES)),
                   _vm((B, TILE_ROWS, _LANES)), _vm((B, TILE_ROWS, _LANES)),
                   _vm((2, TILE_ROWS, _LANES)), _lane_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((2, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, _LANES), jnp.int32),
        ),
        interpret=_interpret(),
    )(tabvec, st["o"], st["d"], st["thr"], st["rad"], st["aux"], u_t)
    o, d, thr, rad, aux, bits = outs
    return {"o": o, "d": d, "thr": thr, "rad": rad, "aux": aux}, bits


# --- diagnostic kernel variants (benchmarks/fusedprof.py) --------------------


def _replay_kernel(spec, tab_ref, o_ref, d_ref, thr_ref, rad_ref, aux_ref,
                   u_ref, bits_ref, o_out, d_out, thr_out, rad_out):
    """Forward bounce with decisions REPLAYED from bits (no decision
    subgraph, no bits assembly) — isolates the cost of the choose path."""
    B = spec.bins
    state = {
        "o": (o_ref[0], o_ref[1], o_ref[2]),
        "d": (d_ref[0], d_ref[1], d_ref[2]),
        "thr": tuple(thr_ref[b] for b in range(B)),
        "alive": aux_ref[0] > 0.5,
        "depth": aux_ref[1],
    }
    out = _bounce_core(spec, lambda k: tab_ref[k], state,
                       tuple(u_ref[k] for k in range(10)), bits_ref[...])
    for c in range(3):
        o_out[c] = out["o"][c]
        d_out[c] = out["d"][c]
    for b in range(B):
        thr_out[b] = out["thr"][b]
        rad_out[b] = rad_ref[b] + out["rad_delta"][b]


@functools.partial(jax.jit, static_argnums=(0,))
def _bounce_replay_call(spec, tabvec, st, u_t, bits):
    B = spec.bins
    R = st["o"].shape[1]
    o, d, thr, rad = pl.pallas_call(
        functools.partial(_replay_kernel, spec),
        grid=(R // TILE_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _vm((3, TILE_ROWS, _LANES)), _vm((3, TILE_ROWS, _LANES)),
                  _vm((B, TILE_ROWS, _LANES)), _vm((B, TILE_ROWS, _LANES)),
                  _vm((2, TILE_ROWS, _LANES)), _vm((10, TILE_ROWS, _LANES)),
                  pl.BlockSpec((TILE_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(_vm((3, TILE_ROWS, _LANES)), _vm((3, TILE_ROWS, _LANES)),
                   _vm((B, TILE_ROWS, _LANES)), _vm((B, TILE_ROWS, _LANES))),
        out_shape=(
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
        ),
        interpret=_interpret(),
    )(tabvec, st["o"], st["d"], st["thr"], st["rad"], st["aux"], u_t, bits)
    return {"o": o, "d": d, "thr": thr, "rad": rad, "aux": st["aux"]}


def _io_kernel(spec, tab_ref, o_ref, d_ref, thr_ref, rad_ref, aux_ref, u_ref,
               o_out, d_out, thr_out, rad_out, aux_out, bits_out):
    """Pure IO: same launches and block DMA as the fwd kernel, near-zero
    compute — the launch+DMA floor."""
    B = spec.bins
    s = tab_ref[0] + u_ref[0]
    for c in range(3):
        o_out[c] = o_ref[c] + s * 0.0
        d_out[c] = d_ref[c]
    for b in range(B):
        thr_out[b] = thr_ref[b]
        rad_out[b] = rad_ref[b]
    aux_out[0] = aux_ref[0]
    aux_out[1] = aux_ref[1]
    bits_out[...] = jnp.zeros_like(o_ref[0], dtype=jnp.int32)


@functools.partial(jax.jit, static_argnums=(0,))
def _bounce_io_call(spec, tabvec, st, u_t):
    B = spec.bins
    R = st["o"].shape[1]
    o, d, thr, rad, aux, _bits = pl.pallas_call(
        functools.partial(_io_kernel, spec),
        grid=(R // TILE_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _vm((3, TILE_ROWS, _LANES)), _vm((3, TILE_ROWS, _LANES)),
                  _vm((B, TILE_ROWS, _LANES)), _vm((B, TILE_ROWS, _LANES)),
                  _vm((2, TILE_ROWS, _LANES)), _vm((10, TILE_ROWS, _LANES))],
        out_specs=(_vm((3, TILE_ROWS, _LANES)), _vm((3, TILE_ROWS, _LANES)),
                   _vm((B, TILE_ROWS, _LANES)), _vm((B, TILE_ROWS, _LANES)),
                   _vm((2, TILE_ROWS, _LANES)), _lane_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((2, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, _LANES), jnp.int32),
        ),
        interpret=_interpret(),
    )(tabvec, st["o"], st["d"], st["thr"], st["rad"], st["aux"], u_t)
    return {"o": o, "d": d, "thr": thr, "rad": rad, "aux": aux}


# --- backward kernel (path-state + table cotangents) ------------------------


@functools.lru_cache(maxsize=None)
def used_offsets(spec):
    """Table-vector offsets the bounce core READS in replay (bits) mode,
    recorded at trace time — the backward kernel takes exactly these as
    differentiable inputs. Padded to a sublane multiple for the per-tile
    cotangent output block."""
    import numpy as _np

    rec = set()

    def tget(k):
        rec.add(int(k))
        return _np.float32(0.125)

    def run(x):
        state = {"o": (x, x, x), "d": (x, x, x),
                 "thr": tuple(x for _ in range(spec.bins)),
                 "alive": x > 0.5, "depth": x}
        u = tuple(x for _ in range(10))
        bits = jnp.zeros((4,), jnp.int32)
        out = _bounce_core(spec, tget, state, u, bits)
        return out["o"][0]

    jax.eval_shape(run, jax.ShapeDtypeStruct((4,), jnp.float32))
    used = tuple(sorted(rec))
    n_pad = (-len(used)) % _SUB
    return used, len(used) + n_pad


def _bwd_kernel(spec, used, u_rows, tab_ref, o_ref, d_ref, thr_ref, aux_ref,
                u_ref, bits_ref, go_ref, gd_ref, gthr_ref, grad_ref,
                go_out, gd_out, gthr_out, gt_out):
    B = spec.bins
    alive = aux_ref[0] > 0.5
    depth = aux_ref[1]
    u = tuple(u_ref[k] for k in range(10))
    bits = bits_ref[...]
    zero = jnp.zeros_like(o_ref[0])
    # pre-broadcast the used table scalars so their vjp cotangents come
    # back PER LANE (no in-graph broadcast transpose -> full reduce); the
    # kernel then folds lanes itself (sublane sum; the caller sums tiles)
    tvals = tuple(tab_ref[k] + zero for k in used)
    kmap = {k: i for i, k in enumerate(used)}

    def f(o3, d3, thr, tv):
        out = _bounce_core(
            spec, lambda k: tv[kmap[k]],
            {"o": o3, "d": d3, "thr": thr, "alive": alive, "depth": depth},
            u, bits)
        return out["o"], out["d"], out["thr"], out["rad_delta"]

    primals = ((o_ref[0], o_ref[1], o_ref[2]),
               (d_ref[0], d_ref[1], d_ref[2]),
               tuple(thr_ref[b] for b in range(B)))
    _, vjp = jax.vjp(f, *primals, tvals)
    cots = ((go_ref[0], go_ref[1], go_ref[2]),
            (gd_ref[0], gd_ref[1], gd_ref[2]),
            tuple(gthr_ref[b] for b in range(B)),
            tuple(grad_ref[b] for b in range(B)))
    go, gd, gthr, gtv = vjp(cots)
    for c in range(3):
        go_out[c] = go[c]
        gd_out[c] = gd[c]
    for b in range(B):
        gthr_out[b] = gthr[b]
    for i in range(u_rows):
        if i < len(used):
            gt_out[0, i] = jnp.sum(gtv[i], axis=0)
        else:
            gt_out[0, i] = jnp.zeros((_LANES,), jnp.float32)


@functools.partial(jax.jit, static_argnums=(0,))
def _bounce_bwd_call(spec, tabvec, o_k, d_k, thr_k, aux_k, u_k, bits_k,
                     go, gd, gthr, g_rad):
    """Returns (go, gd, gthr, gt) — gt is the per-tile partial table
    cotangent [tiles, U_pad, 128] (sum over tiles+lanes outside)."""
    B = spec.bins
    R = o_k.shape[1]
    grid = R // TILE_ROWS
    used, u_rows = used_offsets(spec)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, spec, used, u_rows),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  _vm((3, TILE_ROWS, _LANES)), _vm((3, TILE_ROWS, _LANES)),
                  _vm((B, TILE_ROWS, _LANES)), _vm((2, TILE_ROWS, _LANES)),
                  _vm((10, TILE_ROWS, _LANES)),
                  pl.BlockSpec((TILE_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  _vm((3, TILE_ROWS, _LANES)), _vm((3, TILE_ROWS, _LANES)),
                  _vm((B, TILE_ROWS, _LANES)), _vm((B, TILE_ROWS, _LANES))],
        out_specs=(_vm((3, TILE_ROWS, _LANES)), _vm((3, TILE_ROWS, _LANES)),
                   _vm((B, TILE_ROWS, _LANES)),
                   pl.BlockSpec((1, u_rows, _LANES), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((grid, u_rows, _LANES), jnp.float32),
        ),
        interpret=_interpret(),
    )(tabvec, o_k, d_k, thr_k, aux_k, u_k, bits_k, go, gd, gthr, g_rad)


# --- differentiable span (custom_vjp) ---------------------------------------


def _span_fwd_impl(meta, tabvec, st, u_all):
    spec, _n = meta

    def body(carry, u_t):
        new, bits = _bounce_fwd_call(spec, tabvec, carry, u_t)
        res = (carry["o"], carry["d"], carry["thr"], carry["aux"], bits)
        return new, res

    carry, res = jax.lax.scan(body, st, u_all)
    seg = jnp.sum(res[4] & 1, dtype=jnp.int32)
    return (carry, seg), (tabvec, u_all, res)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _span(meta, tabvec, st, u_all):
    out, _ = _span_fwd_impl(meta, tabvec, st, u_all)
    return out


def _span_fwd(meta, tabvec, st, u_all):
    return _span_fwd_impl(meta, tabvec, st, u_all)


def _span_bwd(meta, res, g):
    spec, _n = meta
    tabvec, u_all, (os_, ds_, thrs, auxs, bits) = res
    g_st, _g_seg = g
    g_rad = g_st["rad"]
    used, u_rows = used_offsets(spec)

    def body(carry, xs):
        go, gd, gthr, gt_acc = carry
        o_k, d_k, thr_k, aux_k, bits_k, u_k = xs
        ngo, ngd, ngthr, gt = _bounce_bwd_call(
            spec, tabvec, o_k, d_k, thr_k, aux_k, u_k, bits_k,
            go, gd, gthr, g_rad)
        # fold this bounce's per-tile table cotangents immediately
        # (tiles + lanes) so the scan carries only a [U_pad] vector
        return (ngo, ngd, ngthr, gt_acc + jnp.sum(gt, axis=(0, 2))), None

    (go0, gd0, gthr0, gt_used), _ = jax.lax.scan(
        body,
        (g_st["o"], g_st["d"], g_st["thr"],
         jnp.zeros((u_rows,), jnp.float32)),
        (os_, ds_, thrs, auxs, bits, u_all), reverse=True)

    cot_tab = jnp.zeros_like(tabvec).at[
        jnp.asarray(used, jnp.int32)].add(gt_used[: len(used)])
    cot_st = {
        "o": go0, "d": gd0, "thr": gthr0, "rad": g_rad,
        "aux": jnp.zeros_like(auxs[0]),
    }
    return cot_tab, cot_st, jnp.zeros_like(u_all)


_span.defvjp(_span_fwd, _span_bwd)


# --- multi-bounce VMEM-resident span ----------------------------------------
# Round-4 profile (fusedprof.json): the per-bounce kernel chain sits on its
# own HBM I/O floor — 25.6 ms of a 30.5 ms fwd+bwd step is writing/reading
# the full ray state to HBM every bounce. These kernels run a WHOLE
# compaction span of bounces per ray tile: state is loaded into VMEM once,
# the bounce loop runs inside the kernel (lax.fori_loop over the same
# ``_bounce_core``), and only the final state plus the per-bounce choice
# bitfields (1 i32 row/bounce vs ~40 f32 rows/bounce of state) touch HBM.
# The backward kernel replays the span forward from the entry state inside
# the kernel (per-bounce entry states land in VMEM scratch, never HBM) and
# then chains ``jax.vjp`` of the bounce core in reverse, accumulating table
# cotangents in-register. Reference bar: the entire recursive trace runs in
# one native call chain without materialising state
# (raysect/optical/ray.pyx:338-455).


def span_mode():
    """Forward-only span mode: 'multi' (default: whole-span VMEM-resident
    kernel — one launch per compaction span, per-tile early exit in-kernel)
    or 'perbounce' (round-4 one-kernel-per-bounce path, kept for A/B).
    Read at trace time so harnesses can flip SOURCE_TPU_SPAN between
    traces."""
    return _os.environ.get("SOURCE_TPU_SPAN", "multi")


def span_mode_diff():
    """Differentiable span mode; default 'perbounce'. MEASURED on v5e
    (benchmarks/span_ab.py, flagship 262k rays): the fwd+bwd step is
    COMPUTE-bound, not HBM-bound — per-bounce 37.6 ms vs multi 39.8 ms,
    because the multi backward re-runs the whole forward replay in-kernel
    (saved per-bounce states are cheaper than recompute at these sizes),
    while forward-only favours multi (15.05 vs 15.23 ms). SOURCE_TPU_SPAN
    overrides both paths; SOURCE_TPU_SPAN_DIFF overrides just this one."""
    return _os.environ.get(
        "SOURCE_TPU_SPAN_DIFF",
        _os.environ.get("SOURCE_TPU_SPAN", "perbounce"))


def _span_tile():
    """Forward span kernel rows per tile (must divide the TILE_ROWS-padded
    row count, i.e. a divisor of TILE_ROWS)."""
    return int(_os.environ.get("SOURCE_TPU_SPAN_TILE", "32"))


def _span_bwd_tile():
    """Backward span kernel rows per tile: smaller than the forward's —
    the replay scratch (n_steps per-bounce entry states) plus the vjp live
    set must fit VMEM."""
    return int(_os.environ.get("SOURCE_TPU_SPAN_BWD_TILE", "8"))


def rng_mode():
    """'host' (default): bounce uniforms come from jax.random on the host
    path — bit-parity with the XLA wavefront tracer, what every parity
    test compares. 'kernel': the span kernels draw from the TPU hardware
    PRNG (pltpu.prng_random_bits) seeded per (trace, fwd-tile, bounce) —
    no threefry pass, no u packing, no u HBM traffic; a
    different-but-equidistributed stream (estimator still exact MC — the
    furnace test is stream-independent). Read at trace time."""
    return _os.environ.get("SOURCE_TPU_RNG", "host")


def _load_u(u_ref, i):
    """The 10 per-lane uniforms of bounce ``i`` from the flattened
    (n_steps*10, T, 128) span block."""
    u = u_ref[pl.ds(i * 10, 10)]
    return tuple(u[k] for k in range(10))


_RNG_GRAN = 8  # rows per PRNG seeding block (the smallest kernel tile)


def _gen_u(seed_ref, my_rows, i):
    """The 10 per-lane uniforms of bounce ``i`` from the TPU PRNG.

    Draws are seeded per (trace seed, GLOBAL 8-row block, bounce) and
    generated _RNG_GRAN rows at a time, so forward and backward kernels
    running at DIFFERENT tile sizes reproduce identical streams (each
    just generates the 8-row blocks its tile covers)."""
    reps = my_rows // _RNG_GRAN
    tile = pl.program_id(0)
    blocks = []
    for j in range(reps):
        blk = tile * reps + j  # global 8-row block index
        # fold (seed, block, bounce) into ONE i32 (this toolchain's
        # Mosaic crashes on multi-operand prng_seed); Weyl-style mixing
        # keeps distinct (block, bounce) pairs on distinct streams
        mixed = (seed_ref[0]
                 + (blk + 1) * jnp.int32(-1640531527)  # 0x9E3779B9
                 + (i + 1) * jnp.int32(747796405)
                 + seed_ref[1] * jnp.int32(277803737))
        pltpu.prng_seed(mixed)
        blocks.append(pltpu.prng_random_bits((10, _RNG_GRAN, _LANES)))
    bits = blocks[0] if reps == 1 else jnp.concatenate(blocks, axis=1)
    # logical shift on the raw i32 bits -> 24-bit non-negative ints
    # (Mosaic has no uint32->f32 cast; i32->f32 is supported)
    u24 = jax.lax.shift_right_logical(bits.astype(jnp.int32), jnp.int32(8))
    return tuple(u24[k].astype(jnp.float32) * (1.0 / (1 << 24))
                 for k in range(10))


def _span_fwd_kernel(spec, n_steps, krng, tile_rows, tab_ref, o_ref, d_ref,
                     thr_ref, rad_ref, aux_ref, u_ref, o_out, d_out, thr_out,
                     rad_out, aux_out, bits_out):
    B = spec.bins
    tget = lambda k: tab_ref[k]
    get_u = ((lambda i: _gen_u(u_ref, tile_rows, i)) if krng
             else (lambda i: _load_u(u_ref, i)))

    def bounce(i, c):
        o, d, thr, rad, alivef, depth = c
        out = _bounce_core(
            spec, tget,
            {"o": o, "d": d, "thr": thr, "alive": alivef > 0.5,
             "depth": depth},
            get_u(i), None)
        rad2 = tuple(rad[b] + out["rad_delta"][b] for b in range(B))
        return (out["o"], out["d"], out["thr"], rad2,
                jnp.where(out["alive_next"], 1.0, 0.0),
                out["depth"]), out["bits"]

    def body(i, c):
        # in-kernel early exit: an all-dead tile's bounce is a no-op with
        # a zero B_ALIVE bit (roulette, hit mask and state update are all
        # alive-gated), so skipping it is estimator-exact
        any_alive = jnp.max(c[4]) > 0.5
        new_c, bits = jax.lax.cond(
            any_alive, bounce,
            lambda _i, cc: (cc, jnp.zeros_like(o_ref[0], dtype=jnp.int32)),
            i, c)
        bits_out[pl.ds(i, 1)] = bits[None]
        return new_c

    c0 = (tuple(o_ref[c] for c in range(3)),
          tuple(d_ref[c] for c in range(3)),
          tuple(thr_ref[b] for b in range(B)),
          tuple(rad_ref[b] for b in range(B)),
          aux_ref[0], aux_ref[1])
    o, d, thr, rad, alivef, depth = jax.lax.fori_loop(0, n_steps, body, c0)
    for c in range(3):
        o_out[c] = o[c]
        d_out[c] = d[c]
    for b in range(B):
        thr_out[b] = thr[b]
        rad_out[b] = rad[b]
    aux_out[0] = alivef
    aux_out[1] = depth


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _span_fwd_call(spec, n_steps, tile, krng, tabvec, st, u_or_seed):
    """One kernel for the whole span. ``u_or_seed``: (n_steps*10, R, 128)
    uniforms (host RNG) or an i32[2] seed (kernel RNG). Returns (final
    packed state, bits (n_steps, R, 128) i32). ``tile`` is static (read
    from the env by the caller OUTSIDE jit, so A/B harnesses can flip it
    between traces — ADVICE r4)."""
    B = spec.bins
    R = st["o"].shape[1]
    T = min(tile, R)
    assert R % T == 0, (R, T)

    def vs(c):
        return pl.BlockSpec((c, T, _LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    u_spec = (pl.BlockSpec(memory_space=pltpu.SMEM) if krng
              else vs(n_steps * 10))
    outs = pl.pallas_call(
        functools.partial(_span_fwd_kernel, spec, n_steps, krng, T),
        grid=(R // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  vs(3), vs(3), vs(B), vs(B), vs(2), u_spec],
        out_specs=(vs(3), vs(3), vs(B), vs(B), vs(2), vs(n_steps)),
        out_shape=(
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((2, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, R, _LANES), jnp.int32),
        ),
        interpret=_interpret(),
    )(tabvec, st["o"], st["d"], st["thr"], st["rad"], st["aux"], u_or_seed)
    o, d, thr, rad, aux, bits = outs
    return {"o": o, "d": d, "thr": thr, "rad": rad, "aux": aux}, bits


def _span_bwd_kernel(spec, used, u_rows, n_steps, krng, my_tile,
                     tab_ref, o_ref, d_ref, thr_ref, aux_ref, u_ref,
                     bits_ref, go_ref, gd_ref, gthr_ref, grad_ref, go_out,
                     gd_out, gthr_out, gt_out, scr):
    B = spec.bins
    SR = 8 + B  # per-bounce saved rows: o(3) d(3) thr(B) alive depth
    tget = lambda k: tab_ref[k]
    zero = jnp.zeros_like(o_ref[0])
    kmap = {k: i for i, k in enumerate(used)}
    get_u = ((lambda i: _gen_u(u_ref, my_tile, i)) if krng
             else (lambda i: _load_u(u_ref, i)))

    # --- phase 1: replay forward, saving each bounce's ENTRY state -----------
    # The per-tile all-dead skip MIRRORS the forward kernel's: a skipped
    # bounce stored bits=0, and replaying _bounce_core on a dead tile with
    # bits=0 is a state no other path ever evaluates (decide-mode always
    # computes real decision bits for dead lanes) — XLA's fusion of the
    # masked intermediates can emit NaNs there. A skipped bounce is an
    # identity on the state, so skipping the replay is exact.
    def fwd_body(i, c):
        o, d, thr, alivef, depth = c
        vals = list(o) + list(d) + list(thr) + [alivef, depth]
        for k, v in enumerate(vals):
            scr[pl.ds(i * SR + k, 1)] = v[None]

        def run(c2):
            o2, d2, thr2, alivef2, depth2 = c2
            out = _bounce_core(
                spec, tget,
                {"o": o2, "d": d2, "thr": thr2, "alive": alivef2 > 0.5,
                 "depth": depth2},
                get_u(i), bits_ref[pl.ds(i, 1)][0])
            return (out["o"], out["d"], out["thr"],
                    jnp.where(out["alive_next"], 1.0, 0.0), out["depth"])

        return jax.lax.cond(jnp.max(alivef) > 0.5, run, lambda c2: c2, c)

    jax.lax.fori_loop(
        0, n_steps, fwd_body,
        ((o_ref[0], o_ref[1], o_ref[2]), (d_ref[0], d_ref[1], d_ref[2]),
         tuple(thr_ref[b] for b in range(B)), aux_ref[0], aux_ref[1]))

    # --- phase 2: reverse vjp chain ------------------------------------------
    grad = tuple(grad_ref[b] for b in range(B))

    def bwd_body(j, c):
        i = n_steps - 1 - j
        ld = lambda k: scr[pl.ds(i * SR + k, 1)][0]
        alivef = ld(6 + B)

        def run(c2):
            go, gd, gthr, gt = c2
            o = (ld(0), ld(1), ld(2))
            d = (ld(3), ld(4), ld(5))
            thr = tuple(ld(6 + b) for b in range(B))
            alive = alivef > 0.5
            depth = ld(7 + B)
            u = get_u(i)
            bits = bits_ref[pl.ds(i, 1)][0]
            # pre-broadcast used table scalars so vjp cotangents come back
            # per lane (same trick as the per-bounce backward kernel)
            tvals = tuple(tab_ref[k] + zero for k in used)

            def f(o3, d3, thr_, tv):
                out = _bounce_core(
                    spec, lambda k: tv[kmap[k]],
                    {"o": o3, "d": d3, "thr": thr_, "alive": alive,
                     "depth": depth}, u, bits)
                return out["o"], out["d"], out["thr"], out["rad_delta"]

            _, vjp = jax.vjp(f, o, d, thr, tvals)
            ngo, ngd, ngthr, gtv = vjp((go, gd, gthr, grad))
            ngt = tuple(gt[idx] + jnp.sum(gtv[idx], axis=0, keepdims=True)
                        for idx in range(len(used)))
            return ngo, ngd, ngthr, ngt

        # all-dead tile: the forward SKIPPED this bounce (identity), so the
        # exact transpose passes cotangents through with no table term —
        # and never vjps the bits=0 dead state (see fwd_body note)
        return jax.lax.cond(jnp.max(alivef) > 0.5, run, lambda c2: c2, c)

    go, gd, gthr, gt = jax.lax.fori_loop(
        0, n_steps, bwd_body,
        ((go_ref[0], go_ref[1], go_ref[2]), (gd_ref[0], gd_ref[1], gd_ref[2]),
         tuple(gthr_ref[b] for b in range(B)),
         tuple(jnp.zeros((1, _LANES), jnp.float32) for _ in used)))
    for c in range(3):
        go_out[c] = go[c]
        gd_out[c] = gd[c]
    for b in range(B):
        gthr_out[b] = gthr[b]
    # per-row stores (static offsets) rather than one u_rows-way concat —
    # gentler on the Mosaic vector allocator
    for idx in range(len(used)):
        gt_out[0, pl.ds(idx, 1)] = gt[idx]
    for idx in range(len(used), u_rows):
        gt_out[0, pl.ds(idx, 1)] = jnp.zeros((1, _LANES), jnp.float32)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _span_bwd_call(spec, n_steps, tile, krng, tabvec, st0, u_flat,
                   bits, go, gd, gthr, g_rad):
    """Whole-span backward: returns (go, gd, gthr, gt) with gt the per-tile
    table cotangent partials [tiles, U_pad, 128] (summed outside)."""
    B = spec.bins
    R = st0["o"].shape[1]
    T = min(tile, R)
    assert R % T == 0, (R, T)
    used, u_rows = used_offsets(spec)

    def vs(c):
        return pl.BlockSpec((c, T, _LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    u_spec = (pl.BlockSpec(memory_space=pltpu.SMEM) if krng
              else vs(n_steps * 10))
    return pl.pallas_call(
        functools.partial(_span_bwd_kernel, spec, used, u_rows, n_steps,
                          krng, T),
        grid=(R // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  vs(3), vs(3), vs(B), vs(2), u_spec, vs(n_steps),
                  vs(3), vs(3), vs(B), vs(B)],
        out_specs=(vs(3), vs(3), vs(B),
                   pl.BlockSpec((1, u_rows, _LANES), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((R // T, u_rows, _LANES), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((n_steps * (8 + B), T, _LANES),
                                   jnp.float32)],
        interpret=_interpret(),
    )(tabvec, st0["o"], st0["d"], st0["thr"], st0["aux"], u_flat, bits,
      go, gd, gthr, g_rad)


def _flat_u(u_all):
    """(n_steps, 10, R, 128) -> (n_steps*10, R, 128)."""
    n, c, R, L = u_all.shape
    return u_all.reshape(n * c, R, L)


def _span_multi_fwd_impl(meta, tabvec, st, u_all):
    spec, n_steps, t_fwd, _t_bwd, krng = meta
    u = u_all if krng else _flat_u(u_all)
    out, bits = _span_fwd_call(spec, n_steps, t_fwd, krng, tabvec, st, u)
    seg = jnp.sum(bits & 1, dtype=jnp.int32)
    return (out, seg), (tabvec, u_all, st, bits)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _span_multi(meta, tabvec, st, u_all):
    out, _ = _span_multi_fwd_impl(meta, tabvec, st, u_all)
    return out


def _span_multi_fwd(meta, tabvec, st, u_all):
    return _span_multi_fwd_impl(meta, tabvec, st, u_all)


def _span_multi_bwd(meta, res, g):
    spec, n_steps, t_fwd, t_bwd, krng = meta
    tabvec, u_all, st0, bits = res
    g_st, _g_seg = g
    used, _u_rows = used_offsets(spec)
    u = u_all if krng else _flat_u(u_all)
    # the bwd tile must NEST inside the forward span tile: a bwd tile that
    # straddled a skipped (bits=0, all-dead) fwd tile and a live one would
    # vjp the dead lanes' bits=0 state (see _span_bwd_kernel skip note)
    go, gd, gthr, gt = _span_bwd_call(
        spec, n_steps, min(t_bwd, t_fwd), krng, tabvec, st0, u, bits,
        g_st["o"], g_st["d"], g_st["thr"], g_st["rad"])
    cot_tab = jnp.zeros_like(tabvec).at[
        jnp.asarray(used, jnp.int32)].add(
            jnp.sum(gt, axis=(0, 2))[: len(used)])
    cot_st = {
        "o": go, "d": gd, "thr": gthr, "rad": g_st["rad"],
        "aux": jnp.zeros_like(st0["aux"]),
    }
    return cot_tab, cot_st, jnp.zeros_like(u_all)


_span_multi.defvjp(_span_multi_fwd, _span_multi_bwd)


# --- driver-facing API ------------------------------------------------------


def _pack_state(state):
    """RayState -> packed dict (f32) + lane count."""
    N = state.origin.shape[0]
    aux = jnp.stack(
        [jnp.where(state.alive, 1.0, 0.0),
         state.depth.astype(jnp.float32)], axis=-1)
    return {
        "o": pack_multi(state.origin),
        "d": pack_multi(state.direction),
        "thr": pack_multi(state.throughput.astype(jnp.float32)),
        "rad": pack_multi(state.radiance.astype(jnp.float32)),
        "aux": pack_multi(aux),
    }, N


def _unpack_state(packed, n, template, seg_add):
    import dataclasses as _dc

    sdt = template.throughput.dtype
    aux = unpack_multi(packed["aux"], n)
    return _dc.replace(
        template,
        origin=unpack_multi(packed["o"], n),
        direction=unpack_multi(packed["d"], n),
        throughput=unpack_multi(packed["thr"], n).astype(sdt),
        radiance=unpack_multi(packed["rad"], n).astype(sdt),
        alive=aux[:, 0] > 0.5,
        depth=jnp.round(aux[:, 1]).astype(jnp.int32),
        segments=template.segments + seg_add,
    )


def _pack_u(u_all):
    """[n_steps, N, >=10] -> f32[n_steps, 10, R, 128]."""
    n_steps, N, _ = u_all.shape
    R = _rows_for(N)
    ut = jnp.transpose(u_all[:, :, :10], (0, 2, 1))
    ut = jnp.pad(ut, ((0, 0), (0, 0), (0, R * _LANES - N)))
    return ut.reshape(n_steps, 10, R, _LANES)


def fused_span(scene, spec, state, u_all=None, seed=None, n_steps=None):
    """Differentiable fused trace. Host RNG: pass ``u_all`` (n, N, >=10).
    Kernel RNG: pass ``seed`` (i32[2]) + ``n_steps`` instead (multi span
    only). Returns RayState."""
    tabvec = pack_tabvec(scene, spec)
    packed, n = _pack_state(state)
    krng = u_all is None
    if krng or span_mode_diff() == "multi":
        ns = int(n_steps) if krng else int(u_all.shape[0])
        meta = (spec, ns, _span_tile(), _span_bwd_tile(), krng)
        u = seed if krng else _pack_u(u_all)
        out, seg = _span_multi(meta, tabvec, packed, u)
    else:
        out, seg = _span((spec, int(u_all.shape[0])), tabvec, packed,
                         _pack_u(u_all))
    return _unpack_state(out, n, state, seg)


def fused_forward_span(scene, spec, state, u_all=None, early_exit=True,
                       seed=None, n_steps=None):
    """Forward-only fused trace (no residuals). Host RNG: pass ``u_all``;
    kernel RNG: pass ``seed`` + ``n_steps``. Returns RayState."""
    tabvec = jax.lax.stop_gradient(pack_tabvec(scene, spec))
    packed, n = _pack_state(state)
    krng = u_all is None
    if krng:
        out, bits = _span_fwd_call(spec, int(n_steps), _span_tile(), True,
                                   tabvec, packed, seed)
        seg = jnp.sum(bits & 1, dtype=jnp.int32)
        return _unpack_state(out, n, state, seg)
    u_p = _pack_u(u_all)
    n_steps = int(u_all.shape[0])

    if span_mode() == "multi":
        # whole-span kernel; early exit happens per tile inside the kernel
        out, bits = _span_fwd_call(spec, n_steps, _span_tile(), False,
                                   tabvec, packed, _flat_u(u_p))
        seg = jnp.sum(bits & 1, dtype=jnp.int32)
        return _unpack_state(out, n, state, seg)

    if early_exit:
        def cond(c):
            i, st, _seg = c
            return (i < n_steps) & jnp.any(st["aux"][0] > 0.5)

        def body(c):
            i, st, seg = c
            new, bits = _bounce_fwd_call(spec, tabvec, st, u_p[i])
            return i + 1, new, seg + jnp.sum(bits & 1, dtype=jnp.int32)

        _, out, seg = jax.lax.while_loop(
            cond, body, (jnp.int32(0), packed, jnp.zeros((), jnp.int32)))
    else:
        def body(i, c):
            st, seg = c
            new, bits = _bounce_fwd_call(spec, tabvec, st, u_p[i])
            return new, seg + jnp.sum(bits & 1, dtype=jnp.int32)

        out, seg = jax.lax.fori_loop(
            0, n_steps, body, (packed, jnp.zeros((), jnp.int32)))
    return _unpack_state(out, n, state, seg)
