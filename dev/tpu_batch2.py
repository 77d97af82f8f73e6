"""Round-5 TPU batch: torus kernels on-chip + mfu refresh marker."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
import jax.numpy as jnp

# --- torus through the packet BVH + fused kernels ON TPU (arccos/cbrt in
# Mosaic is the open risk from the quartic) ---------------------------------
from source_tpu.core.scenegraph.node import World
from source_tpu.core.math.transform import rotate_x, translate
from source_tpu.core.math.vector import Point3D
from source_tpu.primitive import Box, Sphere, Torus
from source_tpu.optical.material import Lambert, UniformSurfaceEmitter
from source_tpu.optical import InterpolatedSF
from source_tpu.compiler import SpectralConfig, compile_scene
from source_tpu.parallel.engine import render_batch, render_loss_and_grads
from source_tpu.tracer.wavefront import RayConfig

spec = InterpolatedSF([400, 700], [1.0, 3.0])
w = World()
Torus(0.8, 0.25, parent=w, transform=translate(0, 0, 1.0) * rotate_x(40.0),
      material=Lambert())
Sphere(0.4, parent=w, transform=translate(1.5, 0, 1.0), material=Lambert())
Box(Point3D(-4, -4, 3.0), Point3D(4, 4, 3.2), parent=w,
    material=UniformSurfaceEmitter(spec, 2.0))
scene = compile_scene(w, SpectralConfig(400.0, 700.0, 5))
cfg = RayConfig(max_depth=5, max_iters=6, extinction_prob=0.1,
                extinction_min_depth=2, compact_schedule=(), early_exit=False)
n = 65536
key = jax.random.PRNGKey(3)
u = jax.random.uniform(key, (n, 2))
d = jnp.stack([(u[:, 0] - 0.5) * 1.2, (u[:, 1] - 0.5) * 1.2, jnp.ones(n)], -1)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
o = jnp.broadcast_to(jnp.asarray([0., 0., -2.5], jnp.float32), (n, 3))

t0 = time.time()
st = jax.jit(lambda s, k: render_batch(s, cfg, o, d, k))(scene, key)
rad = np.asarray(st.radiance)
print(json.dumps({"torus_fwd": {"compile_s": round(time.time() - t0, 1),
                                "finite": bool(np.isfinite(rad).all()),
                                "mean": float(rad.mean()),
                                "segments": int(st.segments)}}), flush=True)

t0 = time.time()
target = jnp.zeros((n, 5), jnp.float32)
loss, g = jax.jit(lambda s, k: render_loss_and_grads(s, cfg, o, d, k, target))(scene, key)
fin = all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g)
          if hasattr(l, "dtype") and l.dtype.kind == "f")
print(json.dumps({"torus_fwd_bwd": {"compile_s": round(time.time() - t0, 1),
                                    "loss": float(loss), "grads_finite": fin}}), flush=True)
print("TORUS TPU OK", flush=True)
