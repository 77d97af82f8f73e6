import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
sys.argv = ["x"]
import tests.test_fused as tf
from source_tpu.parallel.engine import render_loss_and_grads

zoo = tf.zoo.__wrapped__()
cfg = tf._cfg(compact_schedule=((4, 2),))
o, d = tf._rays(256, seed=2)
key = jax.random.PRNGKey(13)
target = jnp.zeros((256, tf.B), jnp.float32)
_, g_ref = tf._ab("0", lambda: render_loss_and_grads(zoo, cfg, o, d, key, target))
_, g_got = tf._ab("1", lambda: render_loss_and_grads(zoo, cfg, o, d, key, target))
a = np.asarray(g_ref.mat_spectra); b = np.asarray(g_got.mat_spectra)
print("ref slot0:", a[3,0]); print("got slot0:", b[3,0])
print("ref slot1:", a[3,1]); print("got slot1:", b[3,1])
print("sums:", a[3,0]+a[3,1], b[3,0]+b[3,1])
