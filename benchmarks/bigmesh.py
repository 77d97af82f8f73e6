"""Large-mesh paging benchmark: 1.31M-triangle icosphere, paged Pallas
packet traversal vs the XLA pointer-chase fallback (VERDICT r1 item 4:
paged must be >=10x the fallback).

Measured on one v5e chip, 131k rays:
  r3 (32 serial launches):            802 ms          26.1x XLA
  r4 (one (ray-tile, page) grid):     637 ms
  r5 (+ ray->page sort + winner-     204 ms          77.9x XLA
      seeded cross-page pruning)              — hits identical each time.

Usage: python benchmarks/bigmesh.py   (real TPU)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from tests.test_mesh_paging import _icosphere
from source_tpu.primitive.mesh.data import MeshData
from source_tpu.tracer.meshtrace import mesh_intersect, _mesh_intersect_xla

t0=time.time()
v, f = _icosphere(8, radius=1.0)   # 1.31M triangles
print(f"mesh: {len(f)} tris, gen {time.time()-t0:.1f}s", flush=True)
t0=time.time()
data = MeshData(v, f, smoothing=True, closed=True)
tables = data.to_tables(np.eye(4), np.eye(4))
print(f"BVH+pack {time.time()-t0:.1f}s; pages: {tables.page_meta[0] if tables.page_meta else 1}, "
      f"paged={bool(tables.page_meta)}", flush=True)

N = 1 << 17
key = jax.random.PRNGKey(0)
u = jax.random.uniform(key, (N, 2))
d = jnp.stack([(u[:,0]-0.5)*1.2, (u[:,1]-0.5)*1.2, jnp.ones(N)], -1)
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
o = jnp.broadcast_to(jnp.asarray([0., 0., -3.], jnp.float32), (N,3))
tmin = jnp.zeros(N, jnp.float32)

def timeit(name, fn, reps=3):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/reps
    print(f"{name}: {dt*1e3:.1f} ms -> {N/dt/1e6:.2f} M rays/s", flush=True)
    return out, dt

paged, dt_p = timeit("paged pallas", jax.jit(lambda: mesh_intersect(tables, o, d, tmin)))
xla, dt_x = timeit("xla fallback", jax.jit(lambda: _mesh_intersect_xla(tables, o, d, tmin)), reps=1)
print(f"speedup: {dt_x/dt_p:.1f}x", flush=True)
hp = np.asarray(paged["tri"]) >= 0; hx = np.asarray(xla["tri"]) >= 0
print("hit agreement:", (hp == hx).mean(),
      "t close:", np.allclose(np.asarray(paged["t"])[hp & hx], np.asarray(xla["t"])[hp & hx], rtol=1e-4, atol=1e-5))
