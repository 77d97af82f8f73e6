"""Capture the real _span_multi_bwd inputs (residuals + cotangents) for the
iters=8 NaN case, via an io_callback inside an overridden custom_vjp bwd."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["SOURCE_TPU_FUSED"] = "1"
os.environ["SOURCE_TPU_SPAN"] = "multi"
import numpy as np, jax, jax.numpy as jnp

exec(open("dev/span_nan_repro.py").read().split("def run(")[0])
# ^ rebuilds `scene`, `o`, `d`, `key`, `target` etc.
from source_tpu.tracer import pallas_fused as PF

_dumped = [0]

def _dump(tabvec, bits, g_o, g_d, g_thr, g_rad, st_o, st_d, st_thr, st_aux, u_all):
    np.savez("/tmp/span_dump_%d.npz" % _dumped[0], tabvec=tabvec, bits=bits,
             g_o=g_o, g_d=g_d, g_thr=g_thr, g_rad=g_rad, st_o=st_o,
             st_d=st_d, st_thr=st_thr, st_aux=st_aux, u=u_all)
    _dumped[0] += 1
    return np.int32(0)

def debug_bwd(meta, res, g):
    spec, n_steps = meta
    tabvec, u_all, st0, bits = res
    g_st, _g_seg = g
    jax.experimental.io_callback(
        _dump, jax.ShapeDtypeStruct((), jnp.int32),
        tabvec, bits, g_st["o"], g_st["d"], g_st["thr"], g_st["rad"],
        st0["o"], st0["d"], st0["thr"], st0["aux"], u_all, ordered=True)
    return PF._span_multi_bwd(meta, res, g)

PF._span_multi.defvjp(PF._span_multi_fwd, debug_bwd)

from tests.test_fused import _cfg
cfg = _cfg(compact_schedule=(), max_iters=8)
loss, g = render_loss_and_grads(scene, cfg, o, d, key, target)
w2l = np.asarray(g.leaf_w2l)
print("loss", float(loss), "nan count", int((~np.isfinite(w2l)).sum()),
      "dumps", _dumped[0], flush=True)
