"""Prototype: unified node+tri flat table, single-while_loop per-ray traversal.

Rows [R,12]:
  node: [bmin.xyz, bmax.xyz, 0,0,0, miss(bitcast i32), -1, tag=0]
  tri : [p0.xyz,  e1.xyz,  e2.xyz,  next(bitcast, unused), tri_idx(bitcast), tag=1]
Pointer rule: next = (is_tri | box_hit) ? ptr+1 : miss.  Done when ptr >= R.
Leaf tri rows sit directly after their leaf node row; DFS preorder makes the
row after the last tri of a leaf exactly the leaf's miss target.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

from jet_pbrt_tpu.scene.scenes import bunny_scene
from jet_pbrt_tpu.models import camera as camera_mod


def build_unified(bvh_nodes: np.ndarray, bvh_tris: np.ndarray):
    nodes = np.asarray(bvh_nodes)
    tris = np.asarray(bvh_tris)
    B = nodes.shape[0]
    leaf_code = nodes[:, 7].astype(np.int64)
    first = np.where(leaf_code >= 0, leaf_code // 8, 0)
    count = np.where(leaf_code >= 0, leaf_code % 8, 0)
    # new index of each old node row = old_i + (# tri rows emitted before it)
    tri_prefix = np.concatenate([[0], np.cumsum(count)[:-1]])
    new_of_old = np.arange(B, dtype=np.int64) + tri_prefix
    R = B + int(count.sum())
    tab = np.zeros((R, 12), np.float32)

    def fbits(i):
        return np.asarray(i, np.int32).view(np.float32)

    miss_old = nodes[:, 6].astype(np.int64)
    miss_new = np.where(miss_old >= B, R, new_of_old[np.minimum(miss_old, B - 1)])

    for i in range(B):
        ni = int(new_of_old[i])
        tab[ni, 0:6] = nodes[i, 0:6]
        tab[ni, 9] = fbits(miss_new[i])
        tab[ni, 10] = fbits(-1)
        tab[ni, 11] = 0.0
        c = int(count[i])
        if c:
            f = int(first[i])
            for k in range(c):
                r = ni + 1 + k
                tab[r, 0:9] = tris[f + k]
                tab[r, 9] = fbits(r + 1)
                tab[r, 10] = fbits(f + k)
                tab[r, 11] = 1.0
            # invariant: row after last tri == leaf's miss target
            assert ni + 1 + c == miss_new[i] or miss_new[i] == R and ni + 1 + c == R, \
                (i, ni, c, miss_new[i])
    return tab


def cast_flat(tab, o, d, tmin, tmax):
    n = o.shape[0]
    R = tab.shape[0]
    safe_d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    inv = 1.0 / safe_d
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    ix, iy, iz = inv[:, 0], inv[:, 1], inv[:, 2]

    def body(state):
        it, ptr, t_best, idx_best = state
        live = ptr < R
        row = tab[jnp.minimum(ptr, R - 1)]
        c0, c1, c2 = row[:, 0], row[:, 1], row[:, 2]
        c3, c4, c5 = row[:, 3], row[:, 4], row[:, 5]
        c6, c7, c8 = row[:, 6], row[:, 7], row[:, 8]
        # slab test (node view)
        t0x = (c0 - ox) * ix; t1x = (c3 - ox) * ix
        t0y = (c1 - oy) * iy; t1y = (c4 - oy) * iy
        t0z = (c2 - oz) * iz; t1z = (c5 - oz) * iz
        t_enter = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)), jnp.minimum(t0z, t1z))
        t_exit = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)), jnp.maximum(t0z, t1z))
        box_hit = (t_enter <= t_exit) & (t_exit > tmin) & (t_enter < jnp.minimum(tmax, t_best))
        # Moller-Trumbore (tri view): p0=c0..2 e1=c3..5 e2=c6..8
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
        idx_best = jnp.where(ok, lax.bitcast_convert_type(row[:, 10], jnp.int32), idx_best)
        miss_ln = lax.bitcast_convert_type(row[:, 9], jnp.int32)
        nxt = jnp.where(is_tri | box_hit, ptr + 1, miss_ln)
        ptr = jnp.where(live, nxt, ptr)
        return it + 1, ptr, t_best, idx_best

    def cond(state):
        return jnp.any(state[1] < R)

    st = (jnp.int32(0), jnp.zeros((n,), jnp.int32),
          jnp.full((n,), jnp.inf, jnp.float32), jnp.zeros((n,), jnp.int32))
    it, _, t_best, idx_best = lax.while_loop(cond, body, st)
    return it, t_best, idx_best


def main():
    s = bunny_scene()
    pack, meta = s.pack, s.meta
    print("building unified table...", flush=True)
    t0 = time.perf_counter()
    tab_np = build_unified(np.asarray(pack.bvh_nodes), np.asarray(pack.bvh_tris))
    print(f"unified: {tab_np.shape} ({tab_np.nbytes/1e6:.1f} MB) in {time.perf_counter()-t0:.1f}s", flush=True)
    tab = jnp.asarray(tab_np)

    W = H = 256
    n = W * H
    cam = camera_mod.make_camera(s.camera.lookfrom, s.camera.front, s.camera.vup,
                                 s.camera.vfov, (W, H))
    ids = jnp.arange(n, dtype=jnp.int32)
    x = (ids % W).astype(jnp.float32) + 0.5
    y = (ids // W).astype(jnp.float32) + 0.5
    o, d = camera_mod.generate_rays(cam, jnp.stack([x, y], axis=-1))

    f = jax.jit(lambda tab, o, d: cast_flat(tab, o, d, 1e-3, jnp.inf))
    it, t_best, idx = f(tab, o, d)
    jax.block_until_ready((it, t_best))
    print(f"trip count (max rows visited): {int(it)}", flush=True)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        it, t_best, idx = f(tab, o, d)
    jax.block_until_ready((it, t_best))
    dt = (time.perf_counter() - t0) / reps
    print(f"flat cast: {dt*1e3:.2f} ms for {n} rays -> {n/dt/1e6:.1f} M casts/s "
          f"({dt/int(it)*1e6:.2f} us/step)", flush=True)

    # correctness vs pallas packet kernel
    from jet_pbrt_tpu.ops import pallas_bvh
    g = jax.jit(lambda o, d: pallas_bvh.intersect_bvh_pallas(
        pack.bvh_nodes_pl, pack.bvh_tris_pl, meta.n_bvh_nodes, meta.n_bvh_tris,
        o, d, 1e-3, jnp.inf))
    h = g(o, d)
    jax.block_until_ready(h.t)
    t0 = time.perf_counter()
    for _ in range(reps):
        h = g(o, d)
    jax.block_until_ready(h.t)
    dtp = (time.perf_counter() - t0) / reps
    print(f"pallas packet cast: {dtp*1e3:.2f} ms -> {n/dtp/1e6:.1f} M casts/s", flush=True)

    tb = np.asarray(t_best); tp = np.asarray(h.t)
    hit_f = np.isfinite(tb); hit_p = np.asarray(h.valid)
    print(f"hit agreement: {(hit_f==hit_p).mean()*100:.3f}%  "
          f"t allclose: {np.allclose(tb[hit_f & hit_p], tp[hit_f & hit_p], rtol=1e-4, atol=1e-4)}",
          flush=True)
    mism = np.where(hit_f != hit_p)[0]
    if len(mism):
        print("mismatch rays:", mism[:10], flush=True)


if __name__ == "__main__":
    main()
