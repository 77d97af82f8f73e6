"""Offline analysis of the captured span bwd inputs (/tmp/span_dump_0.npz):
pure-JAX replay + reverse vjp with the REAL cotangents; find the first
non-finite cotangent (bounce, lane) and compare replayed vs per-bounce
forward states on that lane."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["SOURCE_TPU_FUSED"] = "1"
import numpy as np, jax, jax.numpy as jnp

exec(open("dev/span_nan_repro.py").read().split("def run(")[0])
from source_tpu.tracer import pallas_fused as PF
from tests.test_fused import _cfg as _cfg2

cfg = _cfg2(compact_schedule=(), max_iters=8)
spec_f = PF.fused_spec(scene, cfg)
gspec = PF.general_spec(spec_f)
B_ = gspec.bins
z = np.load("/tmp/span_dump_0.npz")
tabvec = jnp.asarray(z["tabvec"])
bits_all = jnp.asarray(z["bits"])          # (n_steps, R, L)
g_o, g_d = jnp.asarray(z["g_o"]), jnp.asarray(z["g_d"])
g_thr, g_rad = jnp.asarray(z["g_thr"]), jnp.asarray(z["g_rad"])
st_o, st_d = jnp.asarray(z["st_o"]), jnp.asarray(z["st_d"])
st_thr, st_aux = jnp.asarray(z["st_thr"]), jnp.asarray(z["st_aux"])
u_all = jnp.asarray(z["u"])                # (n_steps, 10, R, L)
n_steps = bits_all.shape[0]
print("n_steps", n_steps, "R", st_o.shape[1])

tget = lambda k: tabvec[k]
state = {"o": tuple(st_o[c] for c in range(3)),
         "d": tuple(st_d[c] for c in range(3)),
         "thr": tuple(st_thr[b] for b in range(B_)),
         "alive": st_aux[0] > 0.5, "depth": st_aux[1]}
replayed = []
for i in range(n_steps):
    replayed.append(state)
    u = tuple(u_all[i][k] for k in range(10))
    out = PF._bounce_core(gspec, tget, state, u, bits_all[i])
    state = {"o": out["o"], "d": out["d"], "thr": out["thr"],
             "alive": out["alive_next"], "depth": out["depth"]}
    fin = all(bool(jnp.isfinite(x).all()) for x in out["o"] + out["d"] + out["thr"])
    if not fin:
        print(f"bounce {i}: NON-FINITE replayed forward state!", flush=True)

used, u_rows = PF.used_offsets(gspec)
kmap = {k: j for j, k in enumerate(used)}
zero = jnp.zeros_like(st_o[0])
go = tuple(g_o[c] for c in range(3))
gd = tuple(g_d[c] for c in range(3))
gthr = tuple(g_thr[b] for b in range(B_))
grad = tuple(g_rad[b] for b in range(B_))
L = len(gspec.leaves)
for j in range(n_steps):
    i = n_steps - 1 - j
    rep = replayed[i]
    u = tuple(u_all[i][k] for k in range(10))
    bits = bits_all[i]
    tvals = tuple(tabvec[k] + zero for k in used)
    def f(o3_, d3_, thr_, tv):
        out = PF._bounce_core(gspec, lambda k: tv[kmap[k]],
                              {"o": o3_, "d": d3_, "thr": thr_,
                               "alive": rep["alive"], "depth": rep["depth"]},
                              u, bits)
        return out["o"], out["d"], out["thr"], out["rad_delta"]
    _, vjp = jax.vjp(f, rep["o"], rep["d"], rep["thr"], tvals)
    ngo, ngd, ngthr, gtv = vjp((go, gd, gthr, grad))
    msgs = []
    for nm, tup in [("go", ngo), ("gd", ngd), ("gthr", ngthr)]:
        for c, x in enumerate(tup):
            n_bad = int((~jnp.isfinite(x)).sum())
            if n_bad:
                lane = np.unravel_index(int(jnp.argmax(~jnp.isfinite(x))), x.shape)
                msgs.append(f"{nm}[{c}] bad={n_bad} first@{lane}")
    bad_w2l = [k for jj, k in enumerate(used)
               if k < 20 * L and (k % 20) < 12 and not bool(jnp.isfinite(gtv[jj]).all())]
    if msgs or bad_w2l:
        print(f"bounce {i}: {msgs} w2l-bad-offsets={bad_w2l[:6]}...", flush=True)
        if bad_w2l:
            jj = [x for x, k in enumerate(used) if k == bad_w2l[0]][0]
            lane = np.unravel_index(int(jnp.argmax(~jnp.isfinite(gtv[jj]))), gtv[jj].shape)
            print("  first bad lane:", lane, flush=True)
            r_, c_ = int(lane[0]), int(lane[1])
            print("  state o:", [float(rep['o'][k][r_, c_]) for k in range(3)],
                  "d:", [float(rep['d'][k][r_, c_]) for k in range(3)],
                  "alive:", bool(rep['alive'][r_, c_]),
                  "bits:", hex(int(bits[r_, c_])), flush=True)
        break
    go, gd, gthr = ngo, ngd, ngthr
else:
    print("pure-JAX mirror with REAL cotangents: all finite", flush=True)
