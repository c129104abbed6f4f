"""Binary-search the 1.9ms/step pathology in the real flat traversal."""
import os, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

CACHE = "/tmp/unified_tab.npy"
if os.path.exists(CACHE):
    tab_np = np.load(CACHE)
    from jet_pbrt_tpu.scene.scenes import bunny_scene
    s = bunny_scene()
else:
    from jet_pbrt_tpu.scene.scenes import bunny_scene
    from _prof7 import build_unified
    s = bunny_scene()
    tab_np = build_unified(np.asarray(s.pack.bvh_nodes), np.asarray(s.pack.bvh_tris))
    np.save(CACHE, tab_np)

tab = jnp.asarray(tab_np)
R = tab.shape[0]
from jet_pbrt_tpu.models import camera as camera_mod
W = H = 256
n = W * H
cam = camera_mod.make_camera(s.camera.lookfrom, s.camera.front, s.camera.vup, s.camera.vfov, (W, H))
ids = jnp.arange(n, dtype=jnp.int32)
x = (ids % W).astype(jnp.float32) + 0.5
y = (ids // W).astype(jnp.float32) + 0.5
o, d = camera_mod.generate_rays(cam, jnp.stack([x, y], axis=-1))
tmin, tmax = 1e-3, jnp.inf

safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
inv = 1.0 / safe_d
ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
ix, iy, iz = inv[:, 0], inv[:, 1], inv[:, 2]
K = 320


def full_body(row, ptr, t_best, idx_best, live, use_bitcast=True):
    c0, c1, c2 = row[:, 0], row[:, 1], row[:, 2]
    c3, c4, c5 = row[:, 3], row[:, 4], row[:, 5]
    c6, c7, c8 = row[:, 6], row[:, 7], row[:, 8]
    t0x = (c0 - ox) * ix; t1x = (c3 - ox) * ix
    t0y = (c1 - oy) * iy; t1y = (c4 - oy) * iy
    t0z = (c2 - oz) * iz; t1z = (c5 - oz) * iz
    t_enter = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)), jnp.minimum(t0z, t1z))
    t_exit = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)), jnp.maximum(t0z, t1z))
    box_hit = (t_enter <= t_exit) & (t_exit > tmin) & (t_enter < jnp.minimum(tmax, t_best))
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
    is_tri = row[:, 11] > 0.5
    ok = is_tri & live & (jnp.abs(det) > 1e-12) & (uu >= 0.0) & (vv >= 0.0) \
        & (uu + vv <= 1.0) & (tt > tmin) & (tt < jnp.minimum(tmax, t_best))
    t_best = jnp.where(ok, tt, t_best)
    if use_bitcast:
        idx_new = lax.bitcast_convert_type(row[:, 10], jnp.int32)
        miss_ln = lax.bitcast_convert_type(row[:, 9], jnp.int32)
    else:
        idx_new = row[:, 10].astype(jnp.int32)  # wrong values, perf probe only
        miss_ln = jnp.abs(row[:, 9]).astype(jnp.int32) % R
    idx_best = jnp.where(ok, idx_new, idx_best)
    nxt = jnp.where(is_tri | box_hit, ptr + 1, miss_ln)
    ptr = jnp.where(live, nxt, ptr)
    return ptr, t_best, idx_best


def make(cond_kind, use_bitcast=True, slab_only=False):
    def run(tab, o_unused):
        def body(st):
            it, ptr, t_best, idx_best = st
            live = ptr < R
            row = tab[jnp.minimum(ptr, R - 1)]
            if slab_only:
                c0, c1, c2 = row[:, 0], row[:, 1], row[:, 2]
                c3, c4, c5 = row[:, 3], row[:, 4], row[:, 5]
                t0x = (c0 - ox) * ix; t1x = (c3 - ox) * ix
                t0y = (c1 - oy) * iy; t1y = (c4 - oy) * iy
                t0z = (c2 - oz) * iz; t1z = (c5 - oz) * iz
                t_enter = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)), jnp.minimum(t0z, t1z))
                t_exit = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)), jnp.maximum(t0z, t1z))
                box_hit = (t_enter <= t_exit) & (t_exit > tmin)
                miss_ln = lax.bitcast_convert_type(row[:, 9], jnp.int32)
                is_tri = row[:, 11] > 0.5
                nxt = jnp.where(is_tri | box_hit, ptr + 1, miss_ln)
                ptr = jnp.where(live, nxt, ptr)
            else:
                ptr, t_best, idx_best = full_body(row, ptr, t_best, idx_best, live, use_bitcast)
            return it + 1, ptr, t_best, idx_best
        if cond_kind == "counter":
            cond = lambda st: st[0] < K
        else:
            cond = lambda st: jnp.any(st[1] < R)
        st = (jnp.int32(0), jnp.zeros((n,), jnp.int32),
              jnp.full((n,), jnp.inf, jnp.float32), jnp.zeros((n,), jnp.int32))
        it, ptr, t_best, idx_best = lax.while_loop(cond, body, st)
        return it, t_best, idx_best
    return jax.jit(run)


def bench(name, f):
    r = f(tab, 0)
    jax.block_until_ready(r)
    steps = int(r[0])
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(tab, 0)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms ({steps} steps, {dt/steps*1e6:.2f} us/step)", flush=True)


bench("counter-cond full body   ", make("counter"))
bench("any-cond    full body    ", make("any"))
bench("any-cond    no-bitcast   ", make("any", use_bitcast=False))
bench("any-cond    slab-only    ", make("any", slab_only=True))
