"""Interleaved A/B probe: real fused-kernel wrappers vs structural mirror
in one process, repeated in alternating order, to separate genuine kernel
cost from axon-relay/harness artifacts. Writes benchmarks/launchprobe.json.
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 18
STEPS = 8
B = 15


def main():
    import jax
    import jax.numpy as jnp
    from benchmarks.flagship import build
    from source_tpu.tracer import pallas_fused as pf
    from source_tpu.tracer.wavefront import RayConfig, init_rays

    scene, cfg0, o_all, d_all = build()
    cfg = RayConfig(max_depth=16, max_iters=STEPS, compact_schedule=(),
                    early_exit=False)
    spec = pf.fused_spec(scene, cfg)
    gspec = pf.general_spec(spec)
    state = init_rays(o_all[:N], d_all[:N], B)
    packed, _ = pf._pack_state(state)
    tab = pf.pack_tabvec(scene, spec)
    gtab = pf.pack_tabvec(scene, gspec)
    key = jax.random.PRNGKey(0)
    u_p = pf._pack_u(jax.random.uniform(key, (STEPS, N, 10), jnp.float32))

    def scan_of(call, s, tv):
        @jax.jit
        def run(tv, st, u_p):
            def body(carry, u_t):
                out = call(s, tv, carry, u_t)
                if isinstance(out, tuple):
                    out = out[0]
                return out, None
            out, _ = jax.lax.scan(body, st, u_p)
            return out["rad"]
        return run

    fns = {
        "io": scan_of(lambda s, tv, c, u: pf._bounce_io_call(s, tv, c, u),
                      spec, tab),
        "fwd": scan_of(lambda s, tv, c, u: pf._bounce_fwd_call(s, tv, c, u),
                       spec, tab),
        "fwd_general": scan_of(
            lambda s, tv, c, u: pf._bounce_fwd_call(s, tv, c, u),
            gspec, gtab),
    }
    args = {"io": (tab, packed, u_p), "fwd": (tab, packed, u_p),
            "fwd_general": (gtab, packed, u_p)}
    # compile all first
    for k, f in fns.items():
        jax.block_until_ready(f(*args[k]))
    res = {k: [] for k in fns}
    for rep in range(6):
        for k in list(fns) if rep % 2 == 0 else reversed(list(fns)):
            t0 = time.perf_counter()
            jax.block_until_ready(fns[k](*args[k]))
            res[k].append(round(1e3 * (time.perf_counter() - t0), 2))
    print(json.dumps(res, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "launchprobe.json"), "w") as f:
        json.dump(res, f, indent=1)




def main3():
    """Culprit isolation: the same io kernel invoked (a) through the
    nested-jit wrapper, (b) as a raw pallas_call traced inline."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from benchmarks.flagship import build
    from source_tpu.tracer import pallas_fused as pf
    from source_tpu.tracer.wavefront import RayConfig, init_rays

    scene, cfg0, o_all, d_all = build()
    cfg = RayConfig(max_depth=16, max_iters=STEPS, compact_schedule=(),
                    early_exit=False)
    spec = pf.fused_spec(scene, cfg)
    state = init_rays(o_all[:N], d_all[:N], B)
    packed, _ = pf._pack_state(state)
    tab = pf.pack_tabvec(scene, spec)
    key = jax.random.PRNGKey(0)
    u_p = pf._pack_u(jax.random.uniform(key, (STEPS, N, 10), jnp.float32))
    R = packed["o"].shape[1]

    def raw_io_call(tabvec, st, u_t):
        from jax.experimental.pallas import tpu as pltpu
        B_ = spec.bins
        outs = pl.pallas_call(
            functools.partial(pf._io_kernel, spec),
            grid=(R // pf.TILE_ROWS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pf._vm((3, pf.TILE_ROWS, pf._LANES)),
                      pf._vm((3, pf.TILE_ROWS, pf._LANES)),
                      pf._vm((B_, pf.TILE_ROWS, pf._LANES)),
                      pf._vm((B_, pf.TILE_ROWS, pf._LANES)),
                      pf._vm((2, pf.TILE_ROWS, pf._LANES)),
                      pf._vm((10, pf.TILE_ROWS, pf._LANES))],
            out_specs=(pf._vm((3, pf.TILE_ROWS, pf._LANES)),
                       pf._vm((3, pf.TILE_ROWS, pf._LANES)),
                       pf._vm((B_, pf.TILE_ROWS, pf._LANES)),
                       pf._vm((B_, pf.TILE_ROWS, pf._LANES)),
                       pf._vm((2, pf.TILE_ROWS, pf._LANES)),
                       pf._lane_spec()),
            out_shape=(
                jax.ShapeDtypeStruct((3, R, pf._LANES), jnp.float32),
                jax.ShapeDtypeStruct((3, R, pf._LANES), jnp.float32),
                jax.ShapeDtypeStruct((B_, R, pf._LANES), jnp.float32),
                jax.ShapeDtypeStruct((B_, R, pf._LANES), jnp.float32),
                jax.ShapeDtypeStruct((2, R, pf._LANES), jnp.float32),
                jax.ShapeDtypeStruct((R, pf._LANES), jnp.int32),
            ),
        )(tabvec, st["o"], st["d"], st["thr"], st["rad"], st["aux"], u_t)
        o, d, thr, rad, aux, _bits = outs
        return {"o": o, "d": d, "thr": thr, "rad": rad, "aux": aux}

    @jax.jit
    def run_raw(tab, st, u_p):
        def body(c, u_t):
            return raw_io_call(tab, c, u_t), None
        out, _ = jax.lax.scan(body, st, u_p)
        return out["rad"]

    @jax.jit
    def run_wrapped(tab, st, u_p):
        def body(c, u_t):
            return pf._bounce_io_call(spec, tab, c, u_t), None
        out, _ = jax.lax.scan(body, st, u_p)
        return out["rad"]

    for name, fn in [("raw", run_raw), ("wrapped", run_wrapped)]:
        jax.block_until_ready(fn(tab, packed, u_p))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(tab, packed, u_p))
            ts.append(round(1e3 * (time.perf_counter() - t0), 2))
        print(json.dumps({name: ts}), flush=True)




def main4():
    """Ablate the real io pallas_call piecewise: drop one input/output at a
    time to find which feature carries the ~3 ms/launch floor."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from benchmarks.flagship import build
    from source_tpu.tracer import pallas_fused as pf
    from source_tpu.tracer.wavefront import RayConfig, init_rays

    scene, cfg0, o_all, d_all = build()
    cfg = RayConfig(max_depth=16, max_iters=STEPS, compact_schedule=(),
                    early_exit=False)
    spec = pf.fused_spec(scene, cfg)
    state = init_rays(o_all[:N], d_all[:N], B)
    packed, _ = pf._pack_state(state)
    tab = pf.pack_tabvec(scene, spec)
    key = jax.random.PRNGKey(0)
    u_p = pf._pack_u(jax.random.uniform(key, (STEPS, N, 10), jnp.float32))
    R = packed["o"].shape[1]
    TR = pf.TILE_ROWS
    LN = pf._LANES

    def vmt(C):
        return pl.BlockSpec((C, TR, LN), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def make(with_smem, with_u, with_bits, with_aux_out):
        def kernel(*refs):
            i = 0
            if with_smem:
                tab_ref = refs[i]; i += 1
            o_ref, d_ref, thr_ref, rad_ref, aux_ref = refs[i:i + 5]; i += 5
            if with_u:
                u_ref = refs[i]; i += 1
            o_out, d_out, thr_out, rad_out = refs[i:i + 4]; i += 4
            if with_aux_out:
                aux_out = refs[i]; i += 1
            if with_bits:
                bits_out = refs[i]; i += 1
            for c in range(3):
                o_out[c] = o_ref[c]
                d_out[c] = d_ref[c]
            for b in range(B):
                thr_out[b] = thr_ref[b]
                rad_out[b] = rad_ref[b]
            if with_aux_out:
                aux_out[0] = aux_ref[0]
                aux_out[1] = aux_ref[1]
            if with_bits:
                bits_out[...] = jnp.zeros_like(o_ref[0], dtype=jnp.int32)

        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] if with_smem
                    else []) + [vmt(3), vmt(3), vmt(B), vmt(B), vmt(2)]
        if with_u:
            in_specs += [vmt(10)]
        out_specs = [vmt(3), vmt(3), vmt(B), vmt(B)]
        out_shape = [jax.ShapeDtypeStruct((3, R, LN), jnp.float32),
                     jax.ShapeDtypeStruct((3, R, LN), jnp.float32),
                     jax.ShapeDtypeStruct((B, R, LN), jnp.float32),
                     jax.ShapeDtypeStruct((B, R, LN), jnp.float32)]
        if with_aux_out:
            out_specs += [vmt(2)]
            out_shape += [jax.ShapeDtypeStruct((2, R, LN), jnp.float32)]
        if with_bits:
            out_specs += [pl.BlockSpec((TR, LN), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)]
            out_shape += [jax.ShapeDtypeStruct((R, LN), jnp.int32)]

        @jax.jit
        def run(tab, st, u_p):
            def body(carry, u_t):
                oo, dd, tt, rr, aa = carry
                args = ([tab] if with_smem else []) + [oo, dd, tt, rr, aa]
                if with_u:
                    args += [u_t]
                outs = pl.pallas_call(
                    kernel, grid=(R // TR,), in_specs=in_specs,
                    out_specs=tuple(out_specs), out_shape=tuple(out_shape),
                )(*args)
                return (outs[0], outs[1], outs[2], outs[3], aa), None
            out, _ = jax.lax.scan(
                body, (packed["o"], packed["d"], packed["thr"],
                       packed["rad"], packed["aux"]), u_p)
            return out[0]

        jax.block_until_ready(run(tab, packed, u_p))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(run(tab, packed, u_p))
            ts.append(round(1e3 * (time.perf_counter() - t0), 2))
        ts.sort()
        return ts[len(ts) // 2]

    res = {}
    res["full(smem,u,bits,aux)"] = make(True, True, True, True)
    res["no_bits"] = make(True, True, False, True)
    res["no_aux_out"] = make(True, True, True, False)
    res["no_u"] = make(True, False, True, True)
    res["no_smem"] = make(False, True, True, True)
    res["bare"] = make(False, False, False, False)
    print(json.dumps(res, indent=1), flush=True)


def main5():
    """Process-state poisoning test: the SAME cheap mirror kernel, timed
    before and after building the flagship scene (and after creating N
    dummy device buffers), in one process."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TR = 32
    LN = 128
    R = N // LN

    def vmt(C):
        return pl.BlockSpec((C, TR, LN), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def kernel(o_ref, thr_ref, o_out, thr_out):
        for c in range(3):
            o_out[c] = o_ref[c]
        for b in range(B):
            thr_out[b] = thr_ref[b]

    @jax.jit
    def run(o, thr):
        def body(carry, _):
            oo, tt = pl.pallas_call(
                kernel, grid=(R // TR,),
                in_specs=[vmt(3), vmt(B)], out_specs=(vmt(3), vmt(B)),
                out_shape=(jax.ShapeDtypeStruct((3, R, LN), jnp.float32),
                           jax.ShapeDtypeStruct((B, R, LN), jnp.float32)),
            )(carry[0], carry[1])
            return (oo, tt), None
        out, _ = jax.lax.scan(body, (o, thr), None, length=STEPS)
        return out[0]

    o = jnp.zeros((3, R, LN), jnp.float32)
    thr = jnp.zeros((B, R, LN), jnp.float32)

    def t4():
        jax.block_until_ready(run(o, thr))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(run(o, thr))
            ts.append(round(1e3 * (time.perf_counter() - t0), 2))
        return ts

    print(json.dumps({"before": t4()}), flush=True)

    from benchmarks.flagship import build
    scene, cfg0, o_all, d_all = build()
    print(json.dumps({"after_scene_build": t4()}), flush=True)

    keep = [jnp.full((16, 16), float(i)) for i in range(200)]
    jax.block_until_ready(keep[-1])
    print(json.dumps({"after_200_buffers": t4()}), flush=True)


def main6():
    """Bisect WHAT in the scene build poisons dispatch latency."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TR = 32
    LN = 128
    R = N // LN

    def vmt(C):
        return pl.BlockSpec((C, TR, LN), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def kernel(o_ref, thr_ref, o_out, thr_out):
        for c in range(3):
            o_out[c] = o_ref[c]
        for b in range(B):
            thr_out[b] = thr_ref[b]

    @jax.jit
    def run(o, thr):
        def body(carry, _):
            oo, tt = pl.pallas_call(
                kernel, grid=(R // TR,),
                in_specs=[vmt(3), vmt(B)], out_specs=(vmt(3), vmt(B)),
                out_shape=(jax.ShapeDtypeStruct((3, R, LN), jnp.float32),
                           jax.ShapeDtypeStruct((B, R, LN), jnp.float32)),
            )(carry[0], carry[1])
            return (oo, tt), None
        out, _ = jax.lax.scan(body, (o, thr), None, length=STEPS)
        return out[0]

    o = jnp.zeros((3, R, LN), jnp.float32)
    thr = jnp.zeros((B, R, LN), jnp.float32)

    def t3(tag):
        jax.block_until_ready(run(o, thr))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(o, thr))
            ts.append(round(1e3 * (time.perf_counter() - t0), 2))
        print(json.dumps({tag: ts}), flush=True)

    t3("baseline")
    # step 1: import the package only
    import source_tpu  # noqa
    t3("after_import_source_tpu")
    # step 2: build the WORLD (host-side only)
    from demos.cornell_box import build_world
    world = build_world(glass=True)
    t3("after_build_world")
    # step 3: compile the scene WITHOUT the leaf BVH pack
    import os as _os
    _os.environ["SOURCE_TPU_LEAF_BVH"] = "0"
    from source_tpu.compiler import SpectralConfig, compile_scene
    scene0 = compile_scene(world, SpectralConfig(375.0, 740.0, B))
    t3("after_compile_scene_nobvh")
    # step 4: compile WITH the leaf BVH pack (csrc/bvh.cpp native build!)
    _os.environ.pop("SOURCE_TPU_LEAF_BVH", None)
    scene1 = compile_scene(world, SpectralConfig(375.0, 740.0, B))
    t3("after_compile_scene_bvh")


def main7():
    """Relay-latency discrimination: K pipelined (non-blocking) dispatches
    with ONE final block vs per-call blocking. If the ~25 ms is host/relay
    round-trip latency, the pipelined slope is the true device time."""
    import jax
    import jax.numpy as jnp
    from benchmarks.flagship import BINS, build
    from source_tpu.parallel.engine import render_batch, render_loss_and_grads

    scene, cfg, o, d = build()
    target = jnp.zeros((o.shape[0], BINS), jnp.float32)
    step = jax.jit(lambda s, k: render_loss_and_grads(s, cfg, o, d, k, target))
    fwd = jax.jit(lambda s, k: render_batch(s, cfg, o, d, k).radiance)

    for name, fn in [("fwd", fwd), ("step", step)]:
        out = fn(scene, jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        # per-call blocking
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(scene, jax.random.PRNGKey(i)))
            ts.append(round(1e3 * (time.perf_counter() - t0), 1))
        # pipelined: K dispatches, one block
        for K in (4, 10):
            t0 = time.perf_counter()
            outs = [fn(scene, jax.random.PRNGKey(100 + i)) for i in range(K)]
            jax.block_until_ready(outs)
            tp = 1e3 * (time.perf_counter() - t0)
            print(json.dumps({f"{name}_blocked_ms": ts,
                              f"{name}_pipelined_K{K}_total_ms": round(tp, 1),
                              f"{name}_pipelined_per_step_ms": round(tp / K, 1)}),
                  flush=True)


if __name__ == "__main__":
    if "--pipeline" in sys.argv:
        main7()
    elif "--bisect" in sys.argv:
        main6()
    elif "--poison" in sys.argv:
        main5()
    elif "--ablate" in sys.argv:
        main4()
    elif "--isolate" in sys.argv:
        main3()
    else:
        main()
