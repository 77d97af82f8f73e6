import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from demos.cornell_box import build_world
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.tracer.wavefront import RayConfig
from source_tpu.parallel.engine import render_loss_and_grads

B = 5
scene = compile_scene(build_world(glass=True), SpectralConfig(375.0, 740.0, B))
cfg = RayConfig(max_depth=6, extinction_prob=0.1, extinction_min_depth=3,
                importance_sampling=True, important_path_weight=0.25,
                max_iters=8, compact_schedule=(), early_exit=False)
N = 512
rng = np.random.RandomState(0)
o = jnp.asarray(np.concatenate([rng.uniform(-0.9, 0.9, (N, 2)), np.full((N,1), -2.5)], axis=1), jnp.float32)
d = rng.normal(size=(N, 3)) + np.array([0, 0, 4.0])
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d, jnp.float32)
key = jax.random.PRNGKey(7)
target = jnp.zeros((N, B), jnp.float32)
os.environ["SOURCE_TPU_FUSED"] = "0"
_, g_ref = render_loss_and_grads(scene, cfg, o, d, key, target)
os.environ["SOURCE_TPU_FUSED"] = "1"
_, g_got = render_loss_and_grads(scene, cfg, o, d, key, target)
os.environ.pop("SOURCE_TPU_FUSED")
a = np.asarray(g_ref.leaf_w2l); b = np.asarray(g_got.leaf_w2l)
from source_tpu.tracer.pallas_fused import fused_spec
spec = fused_spec(scene, cfg)
for g in range(a.shape[0]):
    kind = spec.leaves[g][3]
    diff = np.abs(a[g]-b[g]).max()
    print(f"leaf {g} kind {kind}: ref|max| {np.abs(a[g]).max():.4f} got|max| {np.abs(b[g]).max():.4f} diff {diff:.4f}")
