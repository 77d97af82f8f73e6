import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from demos.cornell_box import build_world
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.tracer.wavefront import RayConfig, init_rays
from source_tpu.tracer import pallas_fused as pf

B = 5
scene = compile_scene(build_world(glass=True), SpectralConfig(375.0, 740.0, B))
cfg = RayConfig(max_depth=8, max_iters=10)
spec = pf.fused_spec(scene, cfg)
tab = pf.pack_tabvec(scene, spec)
N = 512
rng = np.random.RandomState(0)
o = jnp.asarray(np.concatenate([rng.uniform(-0.9, 0.9, (N, 2)), np.full((N,1), -2.5)], axis=1), jnp.float32)
d = rng.normal(size=(N, 3)) + np.array([0, 0, 4.0])
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d, jnp.float32)
u_np = np.random.RandomState(9).uniform(size=(N, 10)).astype(np.float32)
u = jnp.asarray(u_np)

# XLA-mode core
state = {"o": (o[:,0], o[:,1], o[:,2]), "d": (d[:,0], d[:,1], d[:,2]),
         "thr": tuple(jnp.ones(N) for _ in range(B)),
         "alive": jnp.ones(N, bool), "depth": jnp.zeros(N)}
out = pf._bounce_core(spec, lambda k: tab[k], state, tuple(u[:, k] for k in range(10)), None)

# pallas kernel (interpret)
st = init_rays(o, d, B)
packed, n = pf._pack_state(st)
u_p = pf._pack_u(u[None])
new, bits = pf._bounce_fwd_call(spec, tab, packed, u_p[0])
got_o = pf.unpack_multi(new["o"], N); got_d = pf.unpack_multi(new["d"], N)
ref_d = np.stack([np.asarray(out["d"][c]) for c in range(3)], -1)
ref_o = np.stack([np.asarray(out["o"][c]) for c in range(3)], -1)
bad = np.where(~np.isclose(np.asarray(got_d), ref_d, atol=1e-5).all(axis=1))[0]
print("d mismatch lanes:", len(bad), bad[:8])
badb = np.where(np.asarray(bits).reshape(-1)[:N] != np.asarray(out["bits"]))[0]
print("bits mismatch lanes:", len(badb), badb[:8])
for l in bad[:3]:
    print(f"lane {l}: core d={ref_d[l]} kernel d={np.asarray(got_d)[l]}")
    print(f"   bits core={np.asarray(out['bits'])[l]:x} kernel={np.asarray(bits).reshape(-1)[l]:x}")

# --- now against trace_step with the same u -----------------------------
from source_tpu.tracer.wavefront import trace_step
ref = trace_step(scene, cfg, st, None, u=u, differentiable=False)
ref_d2 = np.asarray(ref.direction)
bad2 = np.where(~np.isclose(ref_d2, np.asarray(got_d), atol=1e-5).all(axis=1))[0]
print("trace_step vs kernel d mismatch:", len(bad2), bad2[:8])
from source_tpu.tracer.intersect import intersect_scene
rec = intersect_scene(scene, o, d)
for l in bad2[:4]:
    print(f"lane {l}: ent {np.asarray(rec.entity)[l]} exiting {np.asarray(rec.exiting)[l]} n {np.asarray(rec.normal)[l]}")
    print(f"   ref_d {ref_d2[l]} got_d {np.asarray(got_d)[l]} core_d {ref_d[l]}")
    print(f"   u0 {u_np[l,0]:.4f} u1 {u_np[l,1]:.4f} u2 {u_np[l,2]:.4f}")
