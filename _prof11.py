"""Pin down the layout pathology: [N,3]-sliced-inside-jit vs flat args,
and test optimization_barrier / manual repack as in-jit fixes."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

tab = jnp.asarray(np.load("/tmp/unified_tab.npy"))
R = tab.shape[0]
from jet_pbrt_tpu.scene.scenes import bunny_scene
from jet_pbrt_tpu.models import camera as camera_mod
s = bunny_scene()
W = H = 256
n = W * H
cam = camera_mod.make_camera(s.camera.lookfrom, s.camera.front, s.camera.vup, s.camera.vfov, (W, H))
ids = jnp.arange(n, dtype=jnp.int32)
x = (ids % W).astype(jnp.float32) + 0.5
y = (ids // W).astype(jnp.float32) + 0.5
O, D = camera_mod.generate_rays(cam, jnp.stack([x, y], axis=-1))
tmin = 1e-3
K = 320


def loop(tab, ox, oy, oz, dx, dy, dz, ix, iy, iz):
    def body(st):
        it, ptr, t_best, idx_best = st
        live = ptr < R
        row = tab[jnp.minimum(ptr, R - 1)]
        is_tri = row[:, 11] > 0.5
        miss_ln = lax.bitcast_convert_type(row[:, 9], jnp.int32)
        c0, c1, c2 = row[:, 0], row[:, 1], row[:, 2]
        c3, c4, c5 = row[:, 3], row[:, 4], row[:, 5]
        c6, c7, c8 = row[:, 6], row[:, 7], row[:, 8]
        t0x = (c0 - ox) * ix; t1x = (c3 - ox) * ix
        t0y = (c1 - oy) * iy; t1y = (c4 - oy) * iy
        t0z = (c2 - oz) * iz; t1z = (c5 - oz) * iz
        t_enter = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)), jnp.minimum(t0z, t1z))
        t_exit = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)), jnp.maximum(t0z, t1z))
        box_hit = (t_enter <= t_exit) & (t_exit > tmin) & (t_enter < t_best)
        px = dy * c8 - dz * c7
        py = dz * c6 - dx * c8
        pz = dx * c7 - dy * c6
        det = c3 * px + c4 * py + c5 * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tx = ox - c0; ty = oy - c1; tz = oz - c2
        uu = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * c5 - tz * c4
        qy = tz * c3 - tx * c5
        qz = tx * c4 - ty * c3
        vv = (dx * qx + dy * qy + dz * qz) * inv_det
        tt = (c6 * qx + c7 * qy + c8 * qz) * inv_det
        ok = is_tri & live & (jnp.abs(det) > 1e-12) & (uu >= 0.0) & (vv >= 0.0) \
            & (uu + vv <= 1.0) & (tt > tmin) & (tt < t_best)
        t_best = jnp.where(ok, tt, t_best)
        idx_best = jnp.where(ok, lax.bitcast_convert_type(row[:, 10], jnp.int32), idx_best)
        ptr = jnp.where(live, jnp.where(is_tri | box_hit, ptr + 1, miss_ln), ptr)
        return it + 1, ptr, t_best, idx_best
    st = (jnp.int32(0), jnp.zeros((n,), jnp.int32),
          jnp.full((n,), jnp.inf, jnp.float32), jnp.zeros((n,), jnp.int32))
    return lax.while_loop(lambda st: st[0] < K, body, st)


def split(o, d, barrier):
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    inv = 1.0 / safe_d
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             inv[:, 0], inv[:, 1], inv[:, 2]]
    if barrier:
        comps = list(lax.optimization_barrier(tuple(comps)))
    return comps


# B: slice [N,3] inside jit (prof7 style)
fB = jax.jit(lambda tab, o, d: loop(tab, *split(o, d, False)))
# C: same + optimization_barrier
fC = jax.jit(lambda tab, o, d: loop(tab, *split(o, d, True)))
# F: o,d computed inside jit from raw pixel coords (integrator-realistic), no barrier
def gen(xy):
    o, d = camera_mod.generate_rays(cam, xy)
    return loop(tab, *split(o, d, False))
fF = jax.jit(gen)
# G: same with barrier
def genb(xy):
    o, d = camera_mod.generate_rays(cam, xy)
    return loop(tab, *split(o, d, True))
fG = jax.jit(genb)

xy = jnp.stack([x, y], axis=-1)


def bench(name, f, *args):
    r = f(*args)
    jax.block_until_ready(r)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms ({dt/K*1e6:.2f} us/step)", flush=True)


bench("B slice-inside       ", fB, tab, O, D)
bench("C slice+barrier      ", fC, tab, O, D)
bench("F gen-inside         ", fF, xy)
bench("G gen-inside+barrier ", fG, xy)
