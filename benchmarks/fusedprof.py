"""Decomposition profile of the fused-bounce pipeline on the flagship scene.

Times each stage of the fused fwd+bwd in isolation at a fixed batch so the
76 ms step (BENCH r4) can be attributed: forward bounce kernel, backward
(state-cotangent) kernel, the batched XLA table-vjp, and the XLA
wavefront step for reference. All at N rays x STEPS bounces, no
compaction, median of R repeats.

Usage: python benchmarks/fusedprof.py   (real TPU)
Writes benchmarks/fusedprof.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 18
STEPS = 8
R = 5
BINS = 15


def _median_time(fn, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(R):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.flagship import build
    from source_tpu.tracer import pallas_fused as pf
    from source_tpu.tracer.wavefront import RayConfig, init_rays, trace_step

    scene, cfg0, o_all, d_all = build()
    cfg = RayConfig(max_depth=16, extinction_prob=0.1,
                    extinction_min_depth=3, importance_sampling=True,
                    important_path_weight=0.25, max_iters=STEPS,
                    compact_schedule=(), early_exit=False)
    spec = pf.fused_spec(scene, cfg)
    assert spec is not None
    o = o_all[:N]
    d = d_all[:N]
    key = jax.random.PRNGKey(0)
    state = init_rays(o, d, BINS)
    packed, _n = pf._pack_state(state)
    tabvec = pf.pack_tabvec(scene, spec)
    u_all = jax.random.uniform(key, (STEPS, N, 10), jnp.float32)
    u_p = pf._pack_u(u_all)

    res = {"n_rays": N, "steps": STEPS}

    # 1. forward fused kernels (scan over bounces)
    @jax.jit
    def fwd_fused(tabvec, st, u_p):
        def body(carry, u_t):
            new, bits = pf._bounce_fwd_call(spec, tabvec, carry, u_t)
            return new, jnp.sum(bits & 1, dtype=jnp.int32)
        out, segs = jax.lax.scan(body, st, u_p)
        return out["rad"], jnp.sum(segs)

    t = _median_time(fwd_fused, tabvec, packed, u_p)
    rad, segs = fwd_fused(tabvec, packed, u_p)
    segs = int(segs)
    res["fwd_fused_ms"] = round(1e3 * t, 2)
    res["segments"] = segs

    # 2. XLA forward (trace_step scan, fused disabled)
    os.environ["SOURCE_TPU_FUSED"] = "0"

    @jax.jit
    def fwd_xla(scene, st):
        def body(carry, u_t):
            return trace_step(scene, cfg, carry, None, u=u_t,
                              differentiable=False), None
        out, _ = jax.lax.scan(body, st, u_all)
        return out.radiance

    t = _median_time(fwd_xla, scene, state)
    os.environ.pop("SOURCE_TPU_FUSED", None)
    res["fwd_xla_ms"] = round(1e3 * t, 2)

    # 3. the full custom_vjp span fwd (kernels + residual collection)
    @jax.jit
    def span_fwd(tabvec, st, u_p):
        (out, seg), _res = pf._span_fwd_impl((spec, STEPS), tabvec, st, u_p)
        return out["rad"], seg

    t = _median_time(span_fwd, tabvec, packed, u_p)
    res["span_fwd_ms"] = round(1e3 * t, 2)

    # 4. backward state-cotangent kernels alone (reverse scan)
    g_o = packed["o"]
    g_d = packed["d"]
    g_thr = packed["thr"]
    g_rad = packed["rad"] + 1.0

    @jax.jit
    def bwd_kernels(tabvec, st, u_p):
        (out, _seg), (tv, u_saved, (os_, ds_, thrs, auxs, bits)) = (
            pf._span_fwd_impl((spec, STEPS), tabvec, st, u_p))

        def body(carry, xs):
            go, gd, gthr = carry
            o_k, d_k, thr_k, aux_k, bits_k, u_k = xs
            ngo, ngd, ngthr, _gt = pf._bounce_bwd_call(
                spec, tv, o_k, d_k, thr_k, aux_k, u_k, bits_k,
                go, gd, gthr, g_rad)
            return (ngo, ngd, ngthr), None

        (go0, _gd0, _gthr0), _ = jax.lax.scan(
            body, (g_o, g_d, g_thr), (os_, ds_, thrs, auxs, bits, u_saved),
            reverse=True)
        return go0

    t_bwd_total = _median_time(bwd_kernels, tabvec, packed, u_p)
    res["spanfwd_plus_bwdkernels_ms"] = round(1e3 * t_bwd_total, 2)

    # 5. full fwd+bwd through the custom_vjp (adds the XLA table-vjp)
    @jax.jit
    def full(tabvec, st, u_p):
        def loss(tv):
            out, _seg = pf._span((spec, STEPS), tv, st, u_p)
            return jnp.sum(out["rad"])
        return jax.grad(loss)(tabvec)

    t_full = _median_time(full, tabvec, packed, u_p)
    res["full_fwd_bwd_ms"] = round(1e3 * t_full, 2)

    # 6. XLA full fwd+bwd on the same protocol for reference
    os.environ["SOURCE_TPU_FUSED"] = "0"
    from source_tpu.tracer.wavefront import trace_rays_diff

    @jax.jit
    def full_xla(scene):
        def loss(s):
            st = init_rays(o, d, BINS)
            return jnp.sum(trace_rays_diff(s, cfg, st, key).radiance)
        return jax.grad(loss, allow_int=True)(scene).mat_spectra

    t = _median_time(full_xla, scene)
    os.environ.pop("SOURCE_TPU_FUSED", None)
    res["full_xla_ms"] = round(1e3 * t, 2)

    # 7. diagnostics for the forward-kernel cost anomaly:
    #    (a) replay-mode forward (decisions from saved bits -> the decision
    #        subgraph and bits assembly are absent, like the bwd kernel's
    #        primal recompute)
    #    (b) IO floor: same launches + block DMA, near-zero compute
    @jax.jit
    def fwd_then_replay(tabvec, st, u_p):
        def body(carry, u_t):
            new, bits = pf._bounce_fwd_call(spec, tabvec, carry, u_t)
            return new, bits
        _, bits_all = jax.lax.scan(body, st, u_p)

        def body2(carry, xs):
            u_t, bits_t = xs
            new = pf._bounce_replay_call(spec, tabvec, carry, u_t, bits_t)
            return new, None
        out, _ = jax.lax.scan(body2, st, (u_p, bits_all))
        return out["rad"]

    t2 = _median_time(fwd_then_replay, tabvec, packed, u_p)
    res["fwd_plus_replay_ms"] = round(1e3 * t2, 2)
    res["replay_only_ms"] = round(1e3 * (t2 - res["fwd_fused_ms"] / 1e3), 2)

    @jax.jit
    def io_floor(tabvec, st, u_p):
        def body(carry, u_t):
            return pf._bounce_io_call(spec, tabvec, carry, u_t), None
        out, _ = jax.lax.scan(body, st, u_p)
        return out["rad"]

    res["io_floor_ms"] = round(1e3 * _median_time(io_floor, tabvec, packed, u_p), 2)

    res["derived"] = {
        "bwd_kernels_ms": round(
            1e3 * (t_bwd_total - _median_time(span_fwd, tabvec, packed, u_p)),
            2),
        "table_vjp_ms": round(1e3 * (t_full - t_bwd_total), 2),
    }
    print(json.dumps(res, indent=1))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fusedprof.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
