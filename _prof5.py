import time, numpy as np, jax, jax.numpy as jnp
from jet_pbrt_tpu.scene.scenes import bunny_scene
from jet_pbrt_tpu.models import camera as camera_mod
from jet_pbrt_tpu.ops.bvh import intersect_bvh
scene = bunny_scene(); pack = scene.pack; meta = scene.meta
width = height = 256; n = width*height
cam = camera_mod.make_camera(scene.camera.lookfrom, scene.camera.front, scene.camera.vup, scene.camera.vfov, (width, height))
ids = np.arange(n)
x = (ids % width).astype(np.float32)+0.5; y = (ids // width).astype(np.float32)+0.5
o, d = camera_mod.generate_rays(cam, jnp.asarray(np.stack([x,y],-1)))
tmin = jnp.full((n,), 1e-3); tmax = jnp.full((n,), np.inf)
f = jax.jit(lambda o,d: intersect_bvh(pack, o, d, tmin, tmax))
t0=time.perf_counter(); h = f(o,d); jax.block_until_ready(h)
print("compile:", round(time.perf_counter()-t0,1), flush=True)
t0=time.perf_counter(); reps=5
for _ in range(reps): h = f(o,d)
jax.block_until_ready(h); dt=(time.perf_counter()-t0)/reps
print("XLA per-ray traversal, camera rays:", round(dt*1e3,2), "ms ->", round(n/dt/1e6,2), "M rays/s, hits:", int(h.valid.sum()), flush=True)
rs = np.random.RandomState(0)
d2 = rs.randn(n,3).astype(np.float32); d2/=np.linalg.norm(d2,axis=1,keepdims=True)
o2 = np.asarray(scene.pack.world_center)[None,:] + rs.randn(n,3).astype(np.float32)*20
h = f(jnp.asarray(o2), jnp.asarray(d2)); jax.block_until_ready(h)
t0=time.perf_counter()
for _ in range(reps): h = f(jnp.asarray(o2), jnp.asarray(d2))
jax.block_until_ready(h); dt=(time.perf_counter()-t0)/reps
print("XLA per-ray traversal, incoherent:", round(dt*1e3,2), "ms ->", round(n/dt/1e6,2), "M rays/s, hits:", int(h.valid.sum()))
