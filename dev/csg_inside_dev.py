import os, sys
sys.path.insert(0, "/root/repo")
os.environ["SOURCE_TPU_LEAF_BVH"] = "1"
import numpy as np
import jax, jax.numpy as jnp
sys.argv = ["x"]
import tests.test_csg_bvh as tc
from source_tpu.tracer.intersect import intersect_scene

s_bvh = tc._build("1"); s_str = tc._build("0")
l2w = np.asarray(s_bvh.leaf_l2w)
o = jnp.asarray(np.stack([l2w[g][:3, 3] for g in range(s_bvh.n_leaves)]), jnp.float32)
d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), o.shape)
r1 = jax.jit(lambda o, d: intersect_scene(s_bvh, o, d))(o, d)
r2 = jax.jit(lambda o, d: intersect_scene(s_str, o, d))(o, d)
h1, h2 = np.asarray(r1.hit), np.asarray(r2.hit)
bad = np.where(h1 != h2)[0]
le = np.asarray(s_bvh.leaf_entity)
for g in bad:
    print(f"leaf {g} entity {le[g]} origin {np.asarray(o)[g]}")
    print(f"  bvh: hit={h1[g]} t={np.asarray(r1.t)[g]} leaf={np.asarray(r1.leaf)[g]} ex={np.asarray(r1.exiting)[g]}")
    print(f"  str: hit={h2[g]} t={np.asarray(r2.t)[g]} leaf={np.asarray(r2.leaf)[g]} ex={np.asarray(r2.exiting)[g]}")
    # entity structure
    e = le[g]
    for ee, lids, prog in s_bvh.csg_entities:
        if ee == e:
            print("  children:", lids, "prog:", prog)
            for cg in lids:
                print(f"    leaf {cg}: type?", [t for t,s,st in s_bvh.type_slices if s<=cg<st],
                      "params", np.asarray(s_bvh.leaf_params)[cg][:6])
