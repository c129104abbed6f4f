import time, numpy as np, jax, jax.numpy as jnp
from jet_pbrt_tpu.scene.scenes import bunny_scene
from jet_pbrt_tpu.models import camera as camera_mod
from jet_pbrt_tpu.ops.pallas_bvh import intersect_bvh_pallas
scene = bunny_scene(); pack = scene.pack; meta = scene.meta
width = height = 256; n = width*height
cam = camera_mod.make_camera(scene.camera.lookfrom, scene.camera.front, scene.camera.vup, scene.camera.vfov, (width, height))
ids = np.arange(n)
def morton(x, y, bits=9):
    out = np.zeros_like(x)
    for b in range(bits):
        out |= ((x >> b) & 1) << (2*b) | ((y >> b) & 1) << (2*b+1)
    return out
x = ids % width; y = ids // width
perm_m = np.argsort(morton(x, y))
for name, perm in (("raster", ids), ("morton", perm_m)):
    xs = (x[perm]).astype(np.float32) + 0.5
    ys = (y[perm]).astype(np.float32) + 0.5
    o, d = camera_mod.generate_rays(cam, jnp.asarray(np.stack([xs, ys], -1)))
    tmin = jnp.full((n,), 1e-3); tmax = jnp.full((n,), np.inf)
    f = jax.jit(lambda o, d: intersect_bvh_pallas(pack.bvh_nodes_pl, pack.bvh_tris_pl, meta.n_bvh_nodes, meta.n_bvh_tris, o, d, tmin, tmax))
    h = f(o, d); jax.block_until_ready(h)
    t0=time.perf_counter(); reps=5
    for _ in range(reps): h = f(o,d)
    jax.block_until_ready(h); dt=(time.perf_counter()-t0)/reps
    print(name, "per-cast:", round(dt*1e3,2), "ms ->", round(n/dt/1e6,1), "M rays/s, hits:", int(h.valid.sum()), flush=True)
# incoherent diffuse-like: random dirs from hit points
rs = np.random.RandomState(0)
o2 = jnp.asarray(np.asarray(scene.pack.world_center) + rs.randn(n,3).astype(np.float32)*20)
d2 = rs.randn(n,3).astype(np.float32); d2 /= np.linalg.norm(d2,axis=1,keepdims=True)
tmin = jnp.full((n,), 1e-3); tmax = jnp.full((n,), np.inf)
f = jax.jit(lambda o, d: intersect_bvh_pallas(pack.bvh_nodes_pl, pack.bvh_tris_pl, meta.n_bvh_nodes, meta.n_bvh_tris, o, d, tmin, tmax))
h = f(o2, jnp.asarray(d2)); jax.block_until_ready(h)
t0=time.perf_counter(); reps=3
for _ in range(reps): h = f(o2, jnp.asarray(d2))
jax.block_until_ready(h); dt=(time.perf_counter()-t0)/reps
print("incoherent per-cast:", round(dt*1e3,2), "ms ->", round(n/dt/1e6,2), "M rays/s, hits:", int(h.valid.sum()))
