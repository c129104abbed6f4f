"""Per-bounce wide-kernel pop counts in the real bunny render path,
sorted vs unsorted — decides whether sort_rays pays (VERDICT r3 task 2).

Walks the path-tracer loop manually (no NEE shadow rays: closest-hit
traversal only) and prints internal/leaf pops per bounce plus wall time
per traversal pass.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _morton_ids  # noqa: E402


def main():
    from jet_pbrt_tpu.scene.scenes import bunny_scene
    from jet_pbrt_tpu.models import camera as camera_mod
    from jet_pbrt_tpu.models.integrators import li_path
    from jet_pbrt_tpu.ops import rng, wide_bvh, sort as sort_ops
    from jet_pbrt_tpu.ops import bsdf as bsdf_ops
    from jet_pbrt_tpu.ops.linalg import frame_from_z, to_local, to_world, RAY_EPS
    from jet_pbrt_tpu.scene import pack as scene_pack

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    scene = bunny_scene(bvh_leaf_size=16)
    meta, pack = scene.meta, scene.pack
    n = width * width
    cam = camera_mod.make_camera(
        scene.camera.lookfrom, scene.camera.front, scene.camera.vup,
        scene.camera.vfov, (width, width))
    ids = jnp.asarray(_morton_ids(width))
    keys = rng.lane_keys(0, 0, ids)
    jitter = rng.camera_jitter(keys)
    x = (ids % width).astype(jnp.float32) + jitter[:, 0]
    y = (ids // width).astype(jnp.float32) + jitter[:, 1]
    o, d = camera_mod.generate_rays(cam, jnp.stack([x, y], axis=-1))

    def isect_stats(o, d, tmin, tmax):
        return wide_bvh.intersect_wide(
            pack.inst_w_meta, pack.inst_w_bounds, pack.inst_w_tris,
            pack.inst_w_tbl, meta.n_blas_tris, o, d, tmin, tmax,
            leaf_size=meta.bvh_leaf_size, blas_root=meta.wide_blas_root,
            has_inst=True, with_stats=True)

    jisect = jax.jit(isect_stats)

    from jet_pbrt_tpu.ops.gather import take_rows
    from jet_pbrt_tpu.ops.sampling import sample_cosine_hemisphere

    def bounce_step(o, d, tmin, tmax, hit_t, hit_idx, hit_valid, u, bounce):
        """Lambert bounce from the wide-kernel hit (no second pallas
        compile): position from t, geometric normal from blas_n rows."""
        u_vertex = rng.vertex_uniforms(u, bounce, meta.n_lights)
        nrm = take_rows(pack.blas_n, hit_idx % meta.n_blas_tris)
        nrm = jnp.where((jnp.sum(nrm * d, axis=-1) < 0)[:, None], nrm, -nrm)
        frame = frame_from_z(nrm)
        uv2 = rng.stream_bsdf(u_vertex, meta.n_lights)
        wi_l = sample_cosine_hemisphere(uv2)
        wi = to_world(frame, wi_l)
        active = hit_valid
        pos = o + hit_t[:, None] * d
        o2 = jnp.where(active[:, None], pos, o)
        d2 = jnp.where(active[:, None], wi, d)
        tmin2 = jnp.where(active, RAY_EPS, jnp.inf)
        tmax2 = jnp.where(active, jnp.inf, -1.0)
        return o2, d2, tmin2, tmax2, active

    jbounce = jax.jit(bounce_step, static_argnums=(8,))

    for sort in (False, True):
        oo, dd = o, d
        tmin = jnp.full((n,), RAY_EPS)
        tmax = jnp.full((n,), jnp.inf)
        u = keys
        print(f"--- sort={sort}")
        for bounce in range(4):
            hit, stats = jisect(oo, dd, tmin, tmax)
            jax.block_until_ready(stats)
            t0 = time.perf_counter()
            hit, stats = jisect(oo, dd, tmin, tmax)
            jax.block_until_ready(stats)
            dt = time.perf_counter() - t0
            s = np.asarray(stats)
            live = int(np.asarray(tmax > 0).sum())
            print(f"bounce {bounce}: live {live:8d}  int pops {s[:,0].sum():9d} "
                  f"leaf pops {s[:,1].sum():9d}  max/tile "
                  f"{(s[:,0]+s[:,1]).max():5d}  pass {dt*1e3:7.2f} ms",
                  flush=True)
            ht = jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)
            oo, dd, tmin, tmax, active = jbounce(
                oo, dd, tmin, tmax, ht, hit.index, hit.valid, u, bounce)
            if sort:
                world_lo = pack.world_center - pack.world_radius
                world_inv = 1.0 / jnp.maximum(2.0 * pack.world_radius, 1e-12)
                skey = sort_ops.ray_sort_key(
                    active, oo, dd, world_lo,
                    jnp.broadcast_to(world_inv, (3,)))
                perm = jnp.argsort(skey)
                oo, dd, tmin, tmax, u = (x[perm] for x in
                                         (oo, dd, tmin, tmax, u))


if __name__ == "__main__":
    main()
