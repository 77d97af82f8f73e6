import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
sys.argv = ["x"]

import tests.test_fused as tf
from source_tpu.tracer.wavefront import RayConfig
from source_tpu.parallel.engine import render_loss_and_grads

zoo = tf.zoo.__wrapped__()
cfg = tf._cfg(compact_schedule=((4, 2),))
o, d = tf._rays(256, seed=2)
key = jax.random.PRNGKey(13)
target = jnp.zeros((256, tf.B), jnp.float32)
loss_ref, g_ref = tf._ab("0", lambda: render_loss_and_grads(zoo, cfg, o, d, key, target))
loss_got, g_got = tf._ab("1", lambda: render_loss_and_grads(zoo, cfg, o, d, key, target))
print("loss:", float(loss_ref), float(loss_got))
for f in ["leaf_w2l", "leaf_params", "mat_params", "mat_spectra", "mat_scalars",
          "imp_centre", "imp_radius", "imp_weight", "imp_cdf", "entity_w2l"]:
    a = np.asarray(getattr(g_ref, f), np.float64)
    b = np.asarray(getattr(g_got, f), np.float64)
    scale = max(np.abs(a).max(), 1e-6)
    rel = np.abs(a - b).max() / scale
    print(f"{f:14s} maxref={np.abs(a).max():.3e} maxgot={np.abs(b).max():.3e} reldiff={rel:.3e}")
    if rel > 2e-4:
        idx = np.unravel_index(np.abs(a - b).argmax(), a.shape)
        print("   worst idx:", idx, "ref", a[idx], "got", b[idx])
