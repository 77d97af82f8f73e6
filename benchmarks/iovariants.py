"""Isolate the fused-kernel per-launch overhead (fusedprof found a pure-IO
kernel costing ~24 ms / 8 launches while the same-input full-math REPLAY
kernel costs 2.7 ms — the difference must be an output-plane pathology).

Times minimal copy kernels over the flagship-sized ray state with output
sets ablated one at a time. Writes benchmarks/iovariants.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 18
B = 15
REPS = 5
STEPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from source_tpu.tracer.pallas_fused import _LANES, _SUB, _vm, _lane_spec

    R = N // _LANES

    o = jnp.zeros((3, R, _LANES), jnp.float32)
    thr = jnp.zeros((B, R, _LANES), jnp.float32)
    aux = jnp.zeros((2, R, _LANES), jnp.float32)

    def variant(name, outs, tile_rows=_SUB):
        """outs: list of (key, C, dtype); kernel copies/constructs each."""

        def kernel(o_ref, thr_ref, aux_ref, *out_refs):
            for (key, C, dt), ref in zip(outs, out_refs):
                if key == "vec":
                    for c in range(3):
                        ref[c] = o_ref[c]
                elif key == "spec":
                    for b in range(B):
                        ref[b] = thr_ref[b]
                elif key == "aux":
                    ref[0] = aux_ref[0]
                    ref[1] = aux_ref[1]
                elif key == "bits_i32":
                    ref[...] = jnp.zeros_like(o_ref[0], jnp.int32)
                elif key == "bits_f32":
                    ref[...] = jnp.zeros_like(o_ref[0])
                elif key == "bits_3d":
                    ref[0] = jnp.zeros_like(o_ref[0], jnp.int32)

        def vmt(block):
            return pl.BlockSpec(block, lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)

        lane_t = pl.BlockSpec((tile_rows, _LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        specs = []
        shapes = []
        for key, C, dt in outs:
            if key in ("vec", "spec", "aux"):
                specs.append(vmt((C, tile_rows, _LANES)))
                shapes.append(jax.ShapeDtypeStruct((C, R, _LANES), dt))
            elif key == "bits_3d":
                specs.append(vmt((1, tile_rows, _LANES)))
                shapes.append(jax.ShapeDtypeStruct((1, R, _LANES), dt))
            else:
                specs.append(lane_t)
                shapes.append(jax.ShapeDtypeStruct((R, _LANES), dt))

        @jax.jit
        def run(o, thr, aux):
            def body(carry, _):
                outs_v = pl.pallas_call(
                    kernel,
                    grid=(R // tile_rows,),
                    in_specs=[vmt((3, tile_rows, _LANES)),
                              vmt((B, tile_rows, _LANES)),
                              vmt((2, tile_rows, _LANES))],
                    out_specs=tuple(specs),
                    out_shape=tuple(shapes),
                    interpret=jax.default_backend() != "tpu",
                )(carry, thr, aux)
                return outs_v[0], None

            out, _ = jax.lax.scan(body, o, None, length=STEPS)
            return out

        out = run(o, thr, aux)
        jax.block_until_ready(out)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = run(o, thr, aux)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return round(1e3 * ts[len(ts) // 2], 2)

    f32 = jnp.float32
    i32 = jnp.int32
    res = {"n_rays": N, "steps": STEPS}
    res["vec_only"] = variant("vec_only", [("vec", 3, f32)])
    res["vec_spec"] = variant("vec_spec", [("vec", 3, f32), ("spec", B, f32)])
    res["vec_spec_aux"] = variant(
        "vec_spec_aux", [("vec", 3, f32), ("spec", B, f32), ("aux", 2, f32)])
    res["vec_spec_bits_i32"] = variant(
        "vec_spec_bits", [("vec", 3, f32), ("spec", B, f32),
                          ("bits_i32", 1, i32)])
    res["vec_spec_bits_f32"] = variant(
        "vec_spec_bitsf", [("vec", 3, f32), ("spec", B, f32),
                           ("bits_f32", 1, f32)])
    res["vec_spec_bits_3d"] = variant(
        "vec_spec_bits3d", [("vec", 3, f32), ("spec", B, f32),
                            ("bits_3d", 1, i32)])
    six = [("vec", 3, f32), ("vec", 3, f32), ("spec", B, f32),
           ("spec", B, f32), ("aux", 2, f32), ("bits_i32", 1, i32)]
    res["all_six"] = variant("all_six", six)
    res["all_six_t32"] = variant("all_six_t32", six, tile_rows=32)
    res["all_six_t64"] = variant("all_six_t64", six, tile_rows=64)
    res["all_six_t128"] = variant("all_six_t128", six, tile_rows=128)
    res["vec_only_t64"] = variant("vec_only_t64", [("vec", 3, f32)],
                                  tile_rows=64)
    print(json.dumps(res, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "iovariants.json"), "w") as f:
        json.dump(res, f, indent=1)


def main2():
    """Mirror _bounce_io_call structure piecewise to find the 24 ms/8-launch
    overhead fusedprof measured but main()'s variants don't reproduce."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from source_tpu.tracer.pallas_fused import _LANES

    TR = 8
    R = N // _LANES
    o = jnp.zeros((3, R, _LANES), jnp.float32)
    d = jnp.zeros((3, R, _LANES), jnp.float32)
    thr = jnp.zeros((B, R, _LANES), jnp.float32)
    rad = jnp.zeros((B, R, _LANES), jnp.float32)
    aux = jnp.zeros((2, R, _LANES), jnp.float32)
    u = jnp.zeros((STEPS, 10, R, _LANES), jnp.float32)
    tab = jnp.zeros((512,), jnp.float32)

    def vmt(C):
        return pl.BlockSpec((C, TR, _LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def make(with_smem, with_u, carry_all):
        def kernel(*refs):
            i = 0
            if with_smem:
                tab_ref = refs[0]; i = 1
            o_ref, d_ref, thr_ref, rad_ref, aux_ref = refs[i:i + 5]
            i += 5
            if with_u:
                u_ref = refs[i]; i += 1
            o_out, d_out, thr_out, rad_out, aux_out = refs[i:i + 5]
            s = tab_ref[0] * 0.0 if with_smem else 0.0
            for c in range(3):
                o_out[c] = o_ref[c] + s
                d_out[c] = d_ref[c]
            for b in range(B):
                thr_out[b] = thr_ref[b]
                rad_out[b] = rad_ref[b]
            aux_out[0] = aux_ref[0] + (u_ref[0] * 0.0 if with_u else 0.0)
            aux_out[1] = aux_ref[1]

        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] if with_smem else [])
        in_specs += [vmt(3), vmt(3), vmt(B), vmt(B), vmt(2)]
        if with_u:
            in_specs += [vmt(10)]
        out_specs = (vmt(3), vmt(3), vmt(B), vmt(B), vmt(2))
        out_shape = (
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((3, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, R, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((2, R, _LANES), jnp.float32),
        )

        @jax.jit
        def run(tab, o, d, thr, rad, aux, u):
            def body(carry, u_t):
                oo, dd, tt, rr, aa = carry
                args = ([tab] if with_smem else []) + [oo, dd, tt, rr, aa]
                if with_u:
                    args += [u_t]
                outs = pl.pallas_call(
                    kernel, grid=(R // TR,), in_specs=in_specs,
                    out_specs=out_specs, out_shape=out_shape,
                    interpret=jax.default_backend() != "tpu",
                )(*args)
                if carry_all:
                    return outs, None
                return (outs[0], dd, tt, rr, aa), None

            carry, _ = jax.lax.scan(body, (o, d, thr, rad, aux), u)
            return carry[0]

        out = run(tab, o, d, thr, rad, aux, u)
        jax.block_until_ready(out)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = run(tab, o, d, thr, rad, aux, u)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return round(1e3 * ts[len(ts) // 2], 2)

    res = {}
    res["plain"] = make(False, False, False)
    res["carry_all"] = make(False, False, True)
    res["with_u"] = make(False, True, True)
    res["with_smem"] = make(True, False, True)
    res["full_mirror"] = make(True, True, True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
    if "--mirror" in sys.argv or True:
        main2()
