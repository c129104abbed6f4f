import numpy as np, jax.numpy as jnp
from jet_pbrt_tpu.ops.bvh import build_bvh, pack_node_table, intersect_bvh
from jet_pbrt_tpu.ops import wide_bvh as W

rng = np.random.default_rng(3)
t = 40
base = rng.uniform(-10, 10, (t,1,3)).astype(np.float32)
tris = base + rng.uniform(-0.8, 0.8, (t,3,3)).astype(np.float32)
p0,p1,p2 = tris[:,0],tris[:,1],tris[:,2]
leaf = 4
bvh, order = build_bvh(p0,p1,p2,leaf_size=leaf)
p0,p1,p2 = p0[order],p1[order],p2[order]
mt = np.concatenate([p0,p1-p0,p2-p0],axis=1).astype(np.float32)
nodes = pack_node_table(bvh, len(order), leaf)
wb, wm, wt, wi, n_wide, root = W.wide_tables(bvh, mt, leaf)
print("n_wide", n_wide, "wb", wb.shape, wb.dtype, "wt", wt.shape)
print("templates", wm[:16])
print("bounds node0 child0:", np.asarray(wb[:6,0], np.float32))

n = W.TILE
o = np.zeros((n,3),np.float32); o[:,2]=12
d = rng.normal(size=(n,3)).astype(np.float32); d/=np.linalg.norm(d,axis=1,keepdims=True)
tmin = jnp.full((n,),1e-3); tmax=jnp.full((n,),jnp.inf)
h_w = W.intersect_wide(jnp.asarray(wm), jnp.asarray(wb), jnp.asarray(wt), jnp.asarray(wi), mt.shape[0], jnp.asarray(o), jnp.asarray(d), tmin, tmax, leaf_size=leaf, interpret=True)
h_x = intersect_bvh(jnp.asarray(nodes), jnp.asarray(mt), jnp.asarray(o), jnp.asarray(d), tmin, tmax, leaf_size=leaf)
print("wide hits:", int(np.sum(np.asarray(h_w.valid))), "xla hits:", int(np.sum(np.asarray(h_x.valid))))
va = np.asarray(h_x.valid) & np.asarray(h_w.valid)
print("t agree:", np.allclose(np.asarray(h_w.t)[va], np.asarray(h_x.t)[va], rtol=1e-4))
