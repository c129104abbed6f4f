"""End-to-end A/B of the three traversal kernels on REAL bunny wave classes
(r4 VERDICT task 1/2: never flip routing without end-to-end numbers again).

Wave classes, generated exactly as li_path produces them (same RNG streams,
same production sorting incl. the needs-BVH key bit):

  primary       1M camera rays, Morton pixel order
  bounce1       hemisphere bounce rays from the primary hits, sorted
  shadow-area   NEE rays to the rect area light at bounce 0, sorted
  shadow-env    NEE rays to the environment light at bounce 0, sorted

Kernels: sweep (ops/sweep_bvh.py, pps variants), wide (ops/wide_bvh.py,
pop-ILP variants), xla (ops/bvh.py skip-link walk).

Timing methodology (hard-won): the axon tunnel makes per-call
block_until_ready unreliable and same-input re-execution can be cached, so
each measurement dispatches `reps` calls over 4 DIFFERENT input variants
async and host-reads one element of the LAST output — the device queue is
FIFO, so the read bounds all reps. Tunnel latency (~27 ms) is subtracted
once.

    python scripts/kernel_ab.py [width=1024]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _morton_ids  # noqa: E402

LATENCY_MS = 27.0
NVAR = 4


def timed(label, fn, variants, reps=8, extra=""):
    f = jax.jit(fn)
    out = f(*variants[0])
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for i in range(reps):
        out = f(*variants[i % NVAR])
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = max((time.perf_counter() - t0) * 1e3 - LATENCY_MS, 0.0) / reps
    print(f"  {label:<28} {dt:9.2f} ms {extra}", flush=True)
    return dt


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    from jet_pbrt_tpu.scene.scenes import bunny_scene
    from jet_pbrt_tpu.scene import objio
    from jet_pbrt_tpu.scene.scenes import ASSET_DIR
    from jet_pbrt_tpu.models import camera as camera_mod
    from jet_pbrt_tpu.ops import rng, sort as sort_ops
    from jet_pbrt_tpu.ops import sweep_bvh as S
    from jet_pbrt_tpu.ops import wide_bvh as W
    from jet_pbrt_tpu.ops import bvh as bvh_ops
    from jet_pbrt_tpu.ops import lights as light_ops
    from jet_pbrt_tpu.ops.gather import take_rows
    from jet_pbrt_tpu.ops.sampling import sample_cosine_hemisphere
    from jet_pbrt_tpu.ops.linalg import frame_from_z, to_world
    import os

    scene = bunny_scene()
    meta, pack = scene.meta, scene.pack
    n = width * width
    n_tris = meta.n_blas_tris[0]
    print(f"bunny {width}x{width}: {n_tris} tris x {meta.n_inst[0]} inst, "
          f"routes: wide={meta.wide_blas} sweep={meta.pallas_blas}",
          flush=True)
    # the builder now only populates the winning route's tables; the A/B
    # needs sweep tables regardless, so build them here
    s_bw, s_sph, s_root, s_ng = S.build_sweep_tables(
        np.asarray(pack.blas_tris[0]))
    s_bw, s_sph, s_root = (jnp.asarray(s_bw), jnp.asarray(s_sph),
                           jnp.asarray(s_root))
    s_tbl = jnp.asarray(S.flat_inst(np.asarray(pack.inst_off[0]),
                                    np.asarray(pack.inst_scale[0])))

    # ---- wide-kernel tables (rebuilt from the same mesh), per leaf size --
    bunny_tris, _uvs = objio.load_obj(os.path.join(ASSET_DIR, "bunny.obj"))
    tris = np.asarray(bunny_tris, np.float32).copy()
    tris[..., 2] *= -1.0  # flip_handedness, as the scene does
    t0_, t1_, t2_ = tris[:, 0], tris[:, 1], tris[:, 2]
    off = np.asarray(pack.inst_off[0])
    scl = np.asarray(pack.inst_scale[0])

    def build_wide(leaf_sz):
        blas, border = bvh_ops.build_bvh(t0_, t1_, t2_, leaf_size=leaf_sz)
        t0s, t1s, t2s = t0_[border], t1_[border], t2_[border]
        tmt = np.concatenate([t0s, t1s - t0s, t2s - t0s], axis=1)
        nodes = bvh_ops.pack_node_table(blas, len(border), leaf_sz)
        ib_lo = nodes[0, :3][None] * scl[:, None] + off
        ib_hi = nodes[0, 3:6][None] * scl[:, None] + off
        tlas, torder = bvh_ops.build_box_bvh(ib_lo, ib_hi, leaf_size=1)
        wt = W.wide_tables_instanced(tlas, blas, tmt, off[torder],
                                     scl[torder], leaf_sz)
        wb, wm, wtr, wi, _nw, wroot = wt
        return dict(bounds=jnp.asarray(wb), meta=jnp.asarray(wm),
                    tris=jnp.asarray(wtr), inst=jnp.asarray(wi),
                    root=wroot, n=len(tmt), tmt=tmt,
                    nodes=nodes, leaf=leaf_sz)

    wide_tabs = {16: build_wide(16)}
    leaf = 16
    tris_mt = wide_tabs[16]["tmt"]
    nodes = wide_tabs[16]["nodes"]
    w_bounds, w_meta, w_tris, w_inst = (
        wide_tabs[16]["bounds"], wide_tabs[16]["meta"],
        wide_tabs[16]["tris"], wide_tabs[16]["inst"])
    w_blasroot = wide_tabs[16]["root"]

    # XLA-walk tables
    x_nodes = jnp.asarray(nodes)
    x_tris = jnp.asarray(tris_mt.astype(np.float32))
    x_off = jnp.asarray(off)
    x_scl = jnp.asarray(scl)

    # ---- ray-class generation (4 variants each) --------------------------
    cam = camera_mod.make_camera(
        scene.camera.lookfrom, scene.camera.front, scene.camera.vup,
        scene.camera.vfov, (width, width))
    ids = jnp.asarray(_morton_ids(width))
    world_lo = pack.world_center - pack.world_radius
    world_inv = jnp.broadcast_to(
        1.0 / jnp.maximum(2.0 * pack.world_radius, 1e-12), (3,))

    def gen_class(s):
        keys = rng.lane_keys(0, s, ids)
        jitter = rng.camera_jitter(keys)
        x = (ids % width).astype(jnp.float32) + jitter[:, 0]
        y = (ids // width).astype(jnp.float32) + jitter[:, 1]
        o, d = camera_mod.generate_rays(cam, jnp.stack([x, y], axis=-1))
        tmin = jnp.full((n,), pack.ray_eps)
        tmax = jnp.full((n,), jnp.inf)
        from jet_pbrt_tpu.scene import pack as scene_pack
        hit = scene_pack.intersect(meta, pack, o, d, tmin, tmax)
        u_vertex = rng.vertex_uniforms(keys, 0, meta.n_lights)

        def sortpack(act, oo, dd, t0v, t1v, shadow=False):
            if shadow:
                key = sort_ops.shadow_sort_key(meta, pack, act, oo, dd,
                                               t0v, t1v)
            else:
                needs = sort_ops.bvh_needed(meta, pack, oo, dd, t0v, t1v)
                key = sort_ops.ray_sort_key(act, oo, dd, world_lo,
                                            world_inv, needs_bvh=needs)
            outs = jax.lax.sort(
                (key, oo[:, 0], oo[:, 1], oo[:, 2],
                 dd[:, 0], dd[:, 1], dd[:, 2], t0v, t1v), num_keys=1)
            return (jnp.stack(outs[1:4], -1), jnp.stack(outs[4:7], -1),
                    outs[7], outs[8])

        def dir6(dd):
            """6-bit direction morton: 2 bits/axis of (d+1)/2."""
            q = jnp.clip(((dd + 1.0) * 2.0).astype(jnp.int32), 0, 3)
            x, y, z = q[:, 0], q[:, 1], q[:, 2]

            def spread(v):
                return (v & 1) | ((v & 2) << 2)
            return spread(x) | (spread(y) << 1) | (spread(z) << 2)

        def sortpack_key(key, oo, dd, t0v, t1v):
            outs = jax.lax.sort(
                (key, oo[:, 0], oo[:, 1], oo[:, 2],
                 dd[:, 0], dd[:, 1], dd[:, 2], t0v, t1v), num_keys=1)
            return (jnp.stack(outs[1:4], -1), jnp.stack(outs[4:7], -1),
                    outs[7], outs[8])

        def morton_of(oo):
            world_lo_ = world_lo
            q = jnp.clip(((oo - world_lo_) * world_inv * 128.0)
                         .astype(jnp.int32), 0, 127)
            return sort_ops.morton3(q)

        classes = {}
        classes["primary"] = (o, d, tmin, tmax)
        # bounce-1: cosine bounce from hits
        live = hit.valid
        nrm = jnp.where((jnp.sum(hit.normal * d, axis=-1) < 0)[:, None],
                        hit.normal, -hit.normal)
        wi = to_world(frame_from_z(nrm),
                      sample_cosine_hemisphere(
                          rng.stream_bsdf(u_vertex, meta.n_lights)))
        o1 = jnp.where(live[:, None], hit.position, o)
        d1 = jnp.where(live[:, None], wi, d)
        b1_t0 = jnp.where(live, pack.ray_eps, jnp.inf)
        b1_t1 = jnp.where(live, jnp.inf, -1.0)
        classes["bounce1"] = sortpack(live, o1, d1, b1_t0, b1_t1)
        # experimental sort keys for the incoherent bounce wave
        needs1 = sort_ops.bvh_needed(meta, pack, o1, d1, b1_t0, b1_t1)
        base1 = jnp.where(needs1, 0, jnp.int32(1 << 28))
        dead1 = jnp.where(live, 0, jnp.int32(1 << 30))
        classes["b1-dir6-minor"] = sortpack_key(
            dead1 | base1 | (morton_of(o1) << 6) | dir6(d1),
            o1, d1, b1_t0, b1_t1)
        classes["b1-dir6-major"] = sortpack_key(
            dead1 | base1 | (dir6(d1) << 21) | morton_of(o1),
            o1, d1, b1_t0, b1_t1)
        # shadow classes at bounce 0
        for name, li_idx in (("shadow-area", 1), ("shadow-env", 0)):
            lm = meta.lights[li_idx]
            ls = light_ops.sample_li(meta, pack, li_idx, hit.position,
                                     rng.stream_nee(u_vertex, li_idx))
            useful = live & (ls.pdf > 0.0)
            delta = ls.pos - hit.position
            dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-20))
            dd = delta / dist[:, None]
            t0v = jnp.where(useful, pack.ray_eps, jnp.inf)
            t1v = jnp.where(useful, dist - pack.ray_eps, -1.0)
            classes[name] = sortpack(useful, hit.position, dd, t0v, t1v,
                                     shadow=True)
            if name == "shadow-env":
                needs_e = sort_ops.bvh_needed(meta, pack, hit.position, dd,
                                              t0v, t1v)
                key = (jnp.where(useful, 0, jnp.int32(1 << 30))
                       | jnp.where(needs_e, 0, jnp.int32(1 << 28))
                       | (dir6(dd) << 21) | morton_of(hit.position))
                classes["senv-dir6-major"] = sortpack_key(
                    key, hit.position, dd, t0v, t1v)
        return classes

    print("generating wave classes...", flush=True)
    gen_j = jax.jit(gen_class)   # eager would go op-by-op over the tunnel
    variants = [gen_j(jnp.int32(s)) for s in range(NVAR)]
    jax.block_until_ready(variants)

    # ---- kernel wrappers -------------------------------------------------
    def sweep(pps, any_hit=False):
        def f(o, d, tmin, tmax):
            return S.intersect_sweep(
                s_sph, s_bw, s_tbl, s_root, n_tris, s_ng,
                o, d, tmin, tmax, n_inst=meta.n_inst[0], any_hit=any_hit,
                pps=pps).t
        return f

    def wide(nip, nlp, any_hit=False, leaf_sz=16):
        tb = wide_tabs[leaf_sz]

        def f(o, d, tmin, tmax):
            return W.intersect_wide(
                tb["meta"], tb["bounds"], tb["tris"], tb["inst"], tb["n"],
                o, d, tmin, tmax, leaf_size=leaf_sz, blas_root=tb["root"],
                has_inst=True, any_hit=any_hit,
                n_int_pop=nip, n_leaf_pop=nlp).t
        return f

    def xla(any_hit=False):
        def f(o, d, tmin, tmax):
            return bvh_ops.intersect_instances(
                x_off, x_scl, x_nodes, x_tris, o, d, tmin, tmax,
                leaf_size=leaf, any_hit=any_hit).t
        return f

    if os.environ.get("AB_STATS"):
        # pop-count forensics: where does the wide kernel spend its pops?
        def wide_stats(o, d, tmin, tmax):
            h, st = W.intersect_wide(
                w_meta, w_bounds, w_tris, w_inst, len(tris_mt),
                o, d, tmin, tmax, leaf_size=leaf, blas_root=w_blasroot,
                has_inst=True, with_stats=True)
            return st
        ws = jax.jit(wide_stats)
        for cls in ("primary", "bounce1", "shadow-area", "shadow-env"):
            vs = variants[0][cls]
            st = np.asarray(ws(*vs))
            live_tiles = (st.sum(axis=1) > 0).sum()
            print(f"{cls}: int pops {st[:,0].sum()}  leaf pops "
                  f"{st[:,1].sum()}  live tiles {live_tiles}/{st.shape[0]} "
                  f"avg/live-tile int={st[:,0].sum()/max(live_tiles,1):.0f} "
                  f"leaf={st[:,1].sum()/max(live_tiles,1):.0f}", flush=True)
        return

    if os.environ.get("AB_TUNE"):
        # pop-mix ILP tuning on the expensive classes (leaf 16 fixed — L8
        # measured equal, dir6 sort keys measured worse; see git history)
        for cls in ("shadow-env", "shadow-area"):
            any_hit = cls.startswith("s")
            vs = [variants[i][cls] for i in range(NVAR)]
            nlive = int(jnp.sum(vs[0][3] > 0))
            print(f"{cls}: live={nlive} ({100*nlive/n:.1f}%)", flush=True)
            for label, fn in (
                ("wide 2+4", wide(2, 4, any_hit, 16)),
                ("wide 2+6", wide(2, 6, any_hit, 16)),
                ("wide 2+8", wide(2, 8, any_hit, 16)),
                ("wide 3+6", wide(3, 6, any_hit, 16)),
            ):
                try:
                    timed(label, fn, vs)
                except Exception as e:  # noqa: BLE001
                    print(f"  {label:<28} FAILED: {str(e)[:160]}",
                          flush=True)
        return

    results = {}
    for cls in ("primary", "bounce1", "shadow-area", "shadow-env"):
        any_hit = cls.startswith("shadow")
        vs = [variants[i][cls] for i in range(NVAR)]
        nlive = int(jnp.sum(vs[0][3] > 0))
        print(f"{cls}: live={nlive} ({100*nlive/n:.1f}%)", flush=True)
        row = {}
        kernel_list = [
            ("sweep pps=8", sweep(8, any_hit)),
            ("sweep pps=4", sweep(4, any_hit)),
            ("sweep pps=2", sweep(2, any_hit)),
            ("wide 4+4", wide(4, 4, any_hit)),
            ("wide 2+2", wide(2, 2, any_hit)),
            ("wide 8+8", wide(8, 8, any_hit)),
        ]
        if os.environ.get("AB_XLA"):
            # the 1M-lane gather-walk takes minutes per pass and can trip
            # the TPU watchdog — opt-in only
            kernel_list.append(("xla walk", xla(any_hit)))
        for label, fn in kernel_list:
            try:
                row[label] = timed(label, fn, vs)
            except Exception as e:  # noqa: BLE001
                print(f"  {label:<28} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        results[cls] = (nlive, row)

    print("\n== summary (ms per 1M-lane pass; live counts in header) ==")
    kernels = ["sweep pps=8", "sweep pps=4", "sweep pps=2", "wide 4+4",
               "wide 2+2", "wide 8+8"]
    if os.environ.get("AB_XLA"):
        kernels.append("xla walk")
    print(f"{'class':<14}" + "".join(f"{k:>14}" for k in kernels))
    for cls, (nlive, row) in results.items():
        cells = "".join(
            f"{row.get(k, float('nan')):>14.2f}" for k in kernels)
        print(f"{cls:<14}" + cells)


if __name__ == "__main__":
    main()
