import os, sys
sys.path.insert(0, "/root/repo")
os.environ["SOURCE_TPU_FUSED"] = "1"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_debug_nans", True)

exec(open("dev/span_nan_repro.py").read().split("def run(")[0])
from source_tpu.tracer import pallas_fused as PF
from tests.test_fused import _cfg as _cfg2

cfg = _cfg2(compact_schedule=(), max_iters=8)
gspec = PF.general_spec(PF.fused_spec(scene, cfg))
B_ = gspec.bins
z = np.load("/tmp/span_dump_0.npz")
tabvec = jnp.asarray(z["tabvec"])
u = tuple(jnp.zeros((1, 1)) for _ in range(10))
bits = jnp.zeros((1, 1), jnp.int32)
zero = jnp.zeros((1, 1), jnp.float32)
o3 = (zero, zero, zero); d3 = (zero, zero, zero)
thr = tuple(zero for _ in range(B_))
used, u_rows = PF.used_offsets(gspec)
kmap = {k: j for j, k in enumerate(used)}
tvals = tuple(tabvec[k] + zero for k in used)

def f(o3_, d3_, thr_, tv):
    out = PF._bounce_core(gspec, lambda k: tv[kmap[k]],
                          {"o": o3_, "d": d3_, "thr": thr_,
                           "alive": zero > 0.5, "depth": zero}, u, bits)
    return out["o"], out["d"], out["thr"], out["rad_delta"]

outs, vjp = jax.vjp(f, o3, d3, thr, tvals)
co = tuple(jnp.zeros((1,1)) for _ in range(3))
ct = tuple(jnp.zeros((1,1)) for _ in range(B_))
try:
    res = vjp((co, co, ct, ct))
    jax.block_until_ready(res)
    print("no nan?!")
except FloatingPointError as e:
    import traceback
    traceback.print_exc()
