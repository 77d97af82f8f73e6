import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from demos.cornell_box import build_world
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.tracer.wavefront import RayConfig, init_rays, trace_rays, trace_rays_diff

B = 5
world = build_world(glass=True)
scene = compile_scene(world, SpectralConfig(375.0, 740.0, B))
cfg = RayConfig(max_depth=8, extinction_prob=0.1, extinction_min_depth=3,
                importance_sampling=True, important_path_weight=0.25,
                max_iters=10, compact_schedule=(), early_exit=False)

from source_tpu.tracer.pallas_fused import fused_spec
spec = fused_spec(scene, cfg)
print("spec:", "OK" if spec else "NONE")
assert spec is not None
print("leaves:", spec.leaves)
print("mat_types:", spec.mat_types, "volumes:", spec.volumes, "n_imp:", spec.n_imp, spec.has_importance)

N = 512
rng = np.random.RandomState(0)
o = jnp.asarray(np.concatenate([rng.uniform(-0.9, 0.9, (N, 2)), np.full((N,1), -2.5)], axis=1), jnp.float32)
d = rng.normal(size=(N, 3)) + np.array([0, 0, 4.0])
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d, jnp.float32)
key = jax.random.PRNGKey(7)

state0 = init_rays(o, d, B)

os.environ["SOURCE_TPU_FUSED"] = "0"
ref = trace_rays(scene, cfg, state0, key)
ref_rad = np.asarray(ref.radiance); ref_alive = np.asarray(ref.alive)
ref_seg = int(ref.segments)

os.environ["SOURCE_TPU_FUSED"] = "1"
got = trace_rays(scene, cfg, state0, key)
got_rad = np.asarray(got.radiance); got_alive = np.asarray(got.alive)
got_seg = int(got.segments)

print("segments:", ref_seg, got_seg)
ok = np.isclose(got_rad, ref_rad, rtol=1e-3, atol=1e-4)
print("radiance match frac:", ok.mean(), " max abs diff:", np.abs(got_rad-ref_rad).max())
print("alive match:", (ref_alive == got_alive).mean())
print("mean rad:", ref_rad.mean(), got_rad.mean())
bad = np.where(~ok.all(axis=1))[0][:10]
print("bad lanes:", bad)
