import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

from demos.cornell_box import build_world
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.tracer.wavefront import RayConfig
from source_tpu.parallel.engine import render_loss_and_grads

B = 5
world = build_world(glass=True)
scene = compile_scene(world, SpectralConfig(375.0, 740.0, B))
cfg = RayConfig(max_depth=6, extinction_prob=0.1, extinction_min_depth=3,
                importance_sampling=True, important_path_weight=0.25,
                max_iters=8, compact_schedule=((4, 2),), remat_block=1)

N = 512
rng = np.random.RandomState(0)
o = jnp.asarray(np.concatenate([rng.uniform(-0.9, 0.9, (N, 2)), np.full((N,1), -2.5)], axis=1), jnp.float32)
d = rng.normal(size=(N, 3)) + np.array([0, 0, 4.0])
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d, jnp.float32)
key = jax.random.PRNGKey(7)
target = jnp.zeros((N, B), jnp.float32)

os.environ["SOURCE_TPU_FUSED"] = "0"
loss_ref, g_ref = render_loss_and_grads(scene, cfg, o, d, key, target)
os.environ["SOURCE_TPU_FUSED"] = "1"
loss_got, g_got = render_loss_and_grads(scene, cfg, o, d, key, target)
print("loss:", float(loss_ref), float(loss_got))

import dataclasses
for f in ["leaf_w2l", "leaf_params", "mat_params", "mat_spectra", "mat_scalars",
          "imp_centre", "imp_radius", "imp_weight", "imp_cdf", "entity_w2l", "leaf_l2w"]:
    a = np.asarray(getattr(g_ref, f), np.float64)
    b = np.asarray(getattr(g_got, f), np.float64)
    scale = max(np.abs(a).max(), np.abs(b).max(), 1e-12)
    rel = np.abs(a - b).max() / scale
    print(f"{f:14s} maxref={np.abs(a).max():.3e} maxgot={np.abs(b).max():.3e} reldiff={rel:.3e}")
