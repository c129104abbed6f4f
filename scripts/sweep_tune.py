"""Time the cull-sweep kernel on frozen bunny rays (primary + bounce-1),
with and without hit-group ray sorting. Async-pipelined timing (the axon
tunnel adds ~20ms to any synchronous per-call measurement)."""
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
    from jet_pbrt_tpu.ops import rng, sweep_bvh as S
    from jet_pbrt_tpu.ops.gather import take_rows
    from jet_pbrt_tpu.ops.sampling import sample_cosine_hemisphere
    from jet_pbrt_tpu.ops.linalg import frame_from_z, to_world, RAY_EPS

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    scene = bunny_scene()
    meta, pack = scene.meta, scene.pack
    # production routes the bunny through the wide kernel now; this harness
    # measures the SWEEP, so build its tables directly
    s_bw, s_sph, s_root, s_ng = S.build_sweep_tables(
        np.asarray(pack.blas_tris[0]))
    s_tbl = S.flat_inst(np.asarray(pack.inst_off[0]),
                        np.asarray(pack.inst_scale[0]))
    print(f"tris {meta.n_blas_tris[0]} groups {s_ng}")

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

    import os
    pps = int(os.environ.get("PPS", "8"))

    def isect(o, d, tmin, tmax):
        return S.intersect_sweep(
            jnp.asarray(s_sph), jnp.asarray(s_bw), jnp.asarray(s_tbl),
            jnp.asarray(s_root), meta.n_blas_tris[0], s_ng,
            o, d, tmin, tmax, n_inst=meta.n_inst[0], pps=pps)

    tmin = jnp.full((n,), RAY_EPS)
    tmax = jnp.full((n,), jnp.inf)
    js = jax.jit(lambda o, d, a, b: isect(o, d, a, b).t)
    jsf = jax.jit(isect)

    hit = jsf(o, d, tmin, tmax)
    ht = jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)
    nrm = take_rows(pack.blas_n[0], hit.index % meta.n_blas_tris[0])
    nrm = jnp.where((jnp.sum(nrm * d, axis=-1) < 0)[:, None], nrm, -nrm)
    wi = to_world(frame_from_z(nrm),
                  sample_cosine_hemisphere(
                      rng.stream_bsdf(rng.vertex_uniforms(keys, 1, 1), 1)))
    live = hit.valid
    o1 = jnp.where(live[:, None], o + ht[:, None] * d, o)
    d1 = jnp.where(live[:, None], wi, d)
    tmin1 = jnp.where(live, RAY_EPS, jnp.inf)
    tmax1 = jnp.where(live, jnp.inf, -1.0)
    print(f"live bounce-1 rays: {int(live.sum())}/{n}")

    # hit-group sort key (what li_path's sort_rays uses for sweep scenes)
    octant = ((d1[:, 0] > 0).astype(jnp.int32)
              | ((d1[:, 1] > 0).astype(jnp.int32) << 1)
              | ((d1[:, 2] > 0).astype(jnp.int32) << 2))
    grp = (hit.index // S.GROUP) << 3
    key = jnp.where(live, grp | octant, jnp.int32(1 << 30))
    perm = jnp.argsort(key)
    o1s, d1s, tmin1s, tmax1s = (v[perm] for v in (o1, d1, tmin1, tmax1))

    for label, (oo, dd, t0_, t1_) in (
        ("primary        ", (o, d, tmin, tmax)),
        ("bounce1 raw    ", (o1, d1, tmin1, tmax1)),
        ("bounce1 sorted ", (o1s, d1s, tmin1s, tmax1s)),
    ):
        r = js(oo, dd, t0_, t1_)
        jax.block_until_ready(r)
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            r = js(oo, dd, t0_, t1_)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"{label}: {dt*1e3:8.2f} ms/pass", flush=True)


if __name__ == "__main__":
    main()
