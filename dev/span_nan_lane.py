"""Single-lane NaN isolation: zero state, bits=0, real u from the dump."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["SOURCE_TPU_FUSED"] = "1"
import numpy as np, jax, jax.numpy as jnp

exec(open("dev/span_nan_repro.py").read().split("def run(")[0])
from source_tpu.tracer import pallas_fused as PF
from tests.test_fused import _cfg as _cfg2

cfg = _cfg2(compact_schedule=(), max_iters=8)
gspec = PF.general_spec(PF.fused_spec(scene, cfg))
B_ = gspec.bins
z = np.load("/tmp/span_dump_0.npz")
tabvec = jnp.asarray(z["tabvec"])
u_all = jnp.asarray(z["u"])
i = 7; r_, c_ = 2, 0
u = tuple(jnp.full((1, 1), float(u_all[i][k][r_, c_])) for k in range(10))
print("u:", [float(x[0,0]) for x in u])
bits = jnp.zeros((1, 1), jnp.int32)
zero = jnp.zeros((1, 1), jnp.float32)
o3 = (zero, zero, zero); d3 = (zero, zero, zero)
thr = tuple(zero for _ in range(B_))
alive = zero > 0.5
depth = zero
used, u_rows = PF.used_offsets(gspec)
kmap = {k: j for j, k in enumerate(used)}
tvals = tuple(tabvec[k] + zero for k in used)

def f(o3_, d3_, thr_, tv):
    out = PF._bounce_core(gspec, lambda k: tv[kmap[k]],
                          {"o": o3_, "d": d3_, "thr": thr_,
                           "alive": alive, "depth": depth}, u, bits)
    return out["o"], out["d"], out["thr"], out["rad_delta"]

outs, vjp = jax.vjp(f, o3, d3, thr, tvals)
# check primal outputs finite
print("primal finite:", all(bool(jnp.isfinite(x).all()) for grp in outs for x in grp))
# try cotangent one-hots per output group/channel
def cots(group, chan, val=1.0):
    co = tuple(jnp.full((1,1), val if (group=="o" and c==chan) else 0.0) for c in range(3))
    cd = tuple(jnp.full((1,1), val if (group=="d" and c==chan) else 0.0) for c in range(3))
    ct = tuple(jnp.full((1,1), val if (group=="thr" and b==chan) else 0.0) for b in range(B_))
    cr = tuple(jnp.full((1,1), val if (group=="rad" and b==chan) else 0.0) for b in range(B_))
    return (co, cd, ct, cr)

for group, nch in [("o",3),("d",3),("thr",B_),("rad",B_),("zero",1)]:
    for ch in range(nch):
        c = cots(group, ch, 0.0 if group=="zero" else 1.0)
        go, gd, gthr, gtv = vjp(c)
        bad = (any(not bool(jnp.isfinite(x).all()) for x in go+gd+gthr)
               or any(not bool(jnp.isfinite(g).all()) for g in gtv))
        if bad or group == "zero":
            badoffs = [used[j] for j, g in enumerate(gtv) if not bool(jnp.isfinite(g).all())]
            print(f"cot {group}[{ch}]: NONFINITE={bad} go={[float(np.asarray(x).ravel()[0]) for x in go]} bad tv offsets={badoffs[:8]}", flush=True)
