import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from demos.cornell_box import build_world
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.tracer.wavefront import RayConfig, init_rays, trace_step, _n_uniforms
from source_tpu.tracer.pallas_fused import fused_spec, fused_span, fused_forward_span

B = 5
world = build_world(glass=True)
scene = compile_scene(world, SpectralConfig(375.0, 740.0, B))
cfg = RayConfig(max_depth=8, extinction_prob=0.1, extinction_min_depth=3,
                importance_sampling=True, important_path_weight=0.25,
                max_iters=10, compact_schedule=(), early_exit=False)
spec = fused_spec(scene, cfg)

N = 512
rng = np.random.RandomState(0)
o = jnp.asarray(np.concatenate([rng.uniform(-0.9, 0.9, (N, 2)), np.full((N,1), -2.5)], axis=1), jnp.float32)
d = rng.normal(size=(N, 3)) + np.array([0, 0, 4.0])
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d, jnp.float32)
key = jax.random.PRNGKey(7)

st = init_rays(o, d, B)
mat_names = {0:'ABS',1:'LAM',2:'EMIT',3:'NULL',4:'COND',5:'RCOND',6:'DIEL'}

for step in range(6):
    u = jax.random.uniform(jax.random.fold_in(key, 100+step), (N, _n_uniforms(scene)), jnp.float32)
    ref = trace_step(scene, cfg, st, None, u=u, differentiable=False)
    got = fused_forward_span(scene, spec, st, u[None], early_exit=False)
    def cmp(name, a, b, tol=1e-4):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == bool:
            bad = np.where(a != b)[0]
        else:
            bad = np.where(~np.isclose(a, b, rtol=1e-3, atol=tol).reshape(a.shape[0], -1).all(axis=1))[0]
        if len(bad):
            print(f"  step {step} {name}: {len(bad)} lanes differ, e.g. {bad[:6]}")
            for l in bad[:3]:
                print(f"    lane {l}: ref={a[l]} got={b[l]}")
        return bad
    cmp("alive", ref.alive, got.alive)
    cmp("depth", ref.depth, got.depth)
    cmp("origin", ref.origin, got.origin)
    cmp("direction", ref.direction, got.direction)
    cmp("thr", ref.throughput, got.throughput)
    cmp("rad", ref.radiance, got.radiance)
    if int(ref.segments) != int(got.segments) - int(st.segments)*0:
        print(f"  step {step} segments ref={int(ref.segments)-int(st.segments)} got={int(got.segments)-int(st.segments)}")
    st = ref  # resync to reference
