"""Decompose the occluded() fixed floor (~25 ms/call at 1M lanes even with
~0 useful lanes, wave_profile r5c). Chained-varied-input methodology."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    from jet_pbrt_tpu.scene.scenes import bunny_scene
    from jet_pbrt_tpu.scene import pack as scene_pack
    from jet_pbrt_tpu.ops import sort as sort_ops
    from jet_pbrt_tpu.ops import wide_bvh as W

    scene = bunny_scene()
    meta, pack = scene.meta, scene.pack
    n = 1 << 20
    R = 4
    rngs = [np.random.default_rng(i) for i in range(R)]
    p_from = [jnp.asarray(r.uniform(-150, 100, (n, 3)) * [1, 0.3, 1],
                          jnp.float32) for r in rngs]
    p_to = [jnp.asarray(r.uniform(-100, 100, (n, 3)) * [1, 0, 1]
                        + [0, 350, 0], jnp.float32) for r in rngs]
    masks = {
        "none useful": [jnp.zeros((n,), bool)] * R,
        "2% useful": [jnp.asarray(r.uniform(size=n) < 0.02) for r in rngs],
        "17% useful": [jnp.asarray(r.uniform(size=n) < 0.17) for r in rngs],
    }

    def timed(label, fn, variants, reps=8):
        f = jax.jit(fn)
        out = f(*variants[0])
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for i in range(reps):
            out = f(*variants[i % R])
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = max((time.perf_counter() - t0) * 1e3 - 27.0, 0.0) / reps
        print(f"{label:<44} {dt:9.2f} ms", flush=True)

    for mk, ms in masks.items():
        timed(f"occluded sorted, {mk}",
              lambda p, q, m: scene_pack.occluded(meta, pack, p, q, mask=m,
                                                  sort=True).astype(
                                                      jnp.float32),
              [(p_from[i], p_to[i], ms[i]) for i in range(R)])
        timed(f"occluded NOSORT, {mk}",
              lambda p, q, m: scene_pack.occluded(meta, pack, p, q, mask=m,
                                                  sort=False).astype(
                                                      jnp.float32),
              [(p_from[i], p_to[i], ms[i]) for i in range(R)])

    # pieces
    d = [(p_to[i] - p_from[i]) for i in range(R)]
    d = [x / jnp.linalg.norm(x, axis=-1, keepdims=True) for x in d]
    tmin = jnp.full((n,), 1e-2)
    dead = jnp.full((n,), -1.0)
    timed("wide any-hit 1M ALL dead",
          lambda o_, d_: W.intersect_wide(
              pack.inst_w_meta[0], pack.inst_w_bounds[0],
              pack.inst_w_tris[0], pack.inst_w_inst[0],
              meta.n_blas_tris[0], o_, d_, jnp.full((n,), jnp.inf), dead,
              leaf_size=meta.blas_leaf_size[0],
              blas_root=meta.wide_blas_root[0], has_inst=True,
              any_hit=True).t,
          [(p_from[i], d[i]) for i in range(R)])
    timed("shadow_sort_key + argsort + gather8 + unsort",
          lambda o_, d_, m: (lambda perm: (jnp.concatenate(
              [o_, d_], axis=1)[perm])[jnp.argsort(perm)])(
              jnp.argsort(sort_ops.shadow_sort_key(
                  meta, pack, m, o_, d_, tmin, jnp.where(m, 1e3, -1.0)))),
          [(p_from[i], d[i], masks["17% useful"][i]) for i in range(R)])
    timed("bvh_needed alone",
          lambda o_, d_: sort_ops.bvh_needed(meta, pack, o_, d_, tmin,
                                             jnp.full((n,), 1e3)).astype(
                                                 jnp.float32),
          [(p_from[i], d[i]) for i in range(R)])


if __name__ == "__main__":
    main()
