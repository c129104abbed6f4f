"""Sweep wide-kernel (n_int_pop, n_leaf_pop) on frozen bounce-1 bunny rays.

Times intersect_wide alone (closest-hit), async-pipelined to hide the
axon tunnel RTT. Usage: kernel_tune.py [width] [KI,KL ...]
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
    from jet_pbrt_tpu.ops import rng, wide_bvh
    from jet_pbrt_tpu.ops.gather import take_rows
    from jet_pbrt_tpu.ops.sampling import sample_cosine_hemisphere
    from jet_pbrt_tpu.ops.linalg import frame_from_z, to_world, RAY_EPS

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfgs = [tuple(int(v) for v in a.split(","))
            for a in sys.argv[2:]] or [(1, 1), (2, 2), (4, 4), (8, 8)]
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

    def isect(o, d, tmin, tmax, ki, kl):
        return wide_bvh.intersect_wide(
            pack.inst_w_meta, pack.inst_w_bounds, pack.inst_w_tris,
            pack.inst_w_tbl, meta.n_blas_tris, o, d, tmin, tmax,
            leaf_size=meta.bvh_leaf_size, blas_root=meta.wide_blas_root,
            has_inst=True, n_int_pop=ki, n_leaf_pop=kl)

    # bounce once (primary hit -> cosine bounce) to get realistic rays
    tmin = jnp.full((n,), RAY_EPS)
    tmax = jnp.full((n,), jnp.inf)
    j0 = jax.jit(lambda o, d, a, b: isect(o, d, a, b, 4, 4))
    hit = j0(o, d, tmin, tmax)
    ht = jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)
    nrm = take_rows(pack.blas_n, hit.index % meta.n_blas_tris)
    nrm = jnp.where((jnp.sum(nrm * d, axis=-1) < 0)[:, None], nrm, -nrm)
    wi = to_world(frame_from_z(nrm),
                  sample_cosine_hemisphere(
                      rng.stream_bsdf(rng.vertex_uniforms(keys, 1, 1), 1)))
    live = hit.valid
    o1 = jnp.where(live[:, None], o + ht[:, None] * d, o)
    d1 = jnp.where(live[:, None], wi, d)
    tmin1 = jnp.where(live, RAY_EPS, jnp.inf)
    tmax1 = jnp.where(live, jnp.inf, -1.0)
    jax.block_until_ready(o1)
    print(f"live bounce-1 rays: {int(live.sum())}/{n}")

    for label, (oo, dd, t0_, t1_) in (
        ("primary", (o, d, tmin, tmax)),
        ("bounce1", (o1, d1, tmin1, tmax1)),
    ):
        for ki, kl in cfgs:
            f = jax.jit(lambda o_, d_, a, b, ki=ki, kl=kl:
                        isect(o_, d_, a, b, ki, kl).t)
            r = f(oo, dd, t0_, t1_)
            jax.block_until_ready(r)
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                r = f(oo, dd, t0_, t1_)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / reps
            print(f"{label} KI={ki} KL={kl}: {dt*1e3:8.2f} ms/pass",
                  flush=True)


if __name__ == "__main__":
    main()
