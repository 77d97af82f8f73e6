import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
sys.argv = ["x"]

import tests.test_fused as tf
from source_tpu.tracer.wavefront import RayConfig, init_rays, trace_step, _n_uniforms
from source_tpu.tracer.pallas_fused import fused_spec, fused_forward_span
from source_tpu.tracer.intersect import intersect_scene

zoo = tf.zoo.__wrapped__()
cfg = tf._cfg()
spec = fused_spec(zoo, cfg)
print("mat_types:", spec.mat_types)
print("leaves:", spec.leaves)
o, d = tf._rays(256, seed=2)
key = jax.random.PRNGKey(13)
st = init_rays(o, d, tf.B)
N = 256
for step in range(6):
    u = jax.random.uniform(jax.random.fold_in(key, 55+step), (N, _n_uniforms(zoo)), jnp.float32)
    ref = trace_step(zoo, cfg, st, None, u=u, differentiable=False)
    got = fused_forward_span(zoo, spec, st, u[None], early_exit=False)
    rec = intersect_scene(zoo, st.origin, st.direction)
    for name in ["alive", "depth", "origin", "direction", "throughput", "radiance"]:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        if a.dtype == bool or a.dtype.kind == 'i':
            bad = np.where((a != b).reshape(a.shape[0], -1).any(axis=1))[0]
        else:
            bad = np.where(~np.isclose(a, b, rtol=1e-3, atol=1e-5).reshape(a.shape[0], -1).all(axis=1))[0]
        if len(bad):
            ent = np.asarray(rec.entity)
            print(f"step {step} {name}: {len(bad)} lanes, entities {ent[bad[:8]]}")
            for l in bad[:2]:
                print(f"   lane {l} ent {ent[l]}: ref={a[l]} got={b[l]}")
    st = ref
