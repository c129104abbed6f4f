"""Isolate the fixed costs behind wave_profile's 140ms occluded floor:
  - intersect_sweep on ALL-DEAD 1M-lane batches (pure per-step overhead)
  - intersect_sweep on 99% dead (128 needy coherent packets)
  - sort_step (argsort + gathers) exactly as li_path does it
  - occluded() minus its sweep (rect-only scene path)
Run on the real chip."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timed(label, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<52} {dt:8.3f} ms", flush=True)
    return out


def main():
    from jet_pbrt_tpu.scene.scenes import bunny_scene
    from jet_pbrt_tpu.ops import sweep_bvh as S
    from jet_pbrt_tpu.ops import sort as sort_ops

    scene = bunny_scene()
    meta, pack = scene.meta, scene.pack
    n = 1 << 20

    s_bw, s_sph, s_root, s_ng = S.build_sweep_tables(
        np.asarray(pack.blas_tris[0]))
    s_tbl = S.flat_inst(np.asarray(pack.inst_off[0]),
                        np.asarray(pack.inst_scale[0]))

    def sweep(o, d, tmin, tmax, pps=8):
        return S.intersect_sweep(
            jnp.asarray(s_sph), jnp.asarray(s_bw), jnp.asarray(s_tbl),
            jnp.asarray(s_root), meta.n_blas_tris[0], s_ng,
            o, d, tmin, tmax, n_inst=meta.n_inst[0], pps=pps).t

    k = jax.random.PRNGKey(0)
    o = jax.random.normal(k, (n, 3)) * 100.0
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    dead_tmin = jnp.full((n,), jnp.inf)
    dead_tmax = jnp.full((n,), -1.0)
    timed("sweep 1M ALL dead", sweep, o, d, dead_tmin, dead_tmax)

    # 98.4% dead: first 16k lanes live & aimed at the bunnies
    m = jnp.arange(n) < (1 << 14)
    o2 = jnp.where(m[:, None], jnp.array([[-300.0, 300.0, -300.0]]), o)
    tgt = jnp.array([[0.0, 30.0, 0.0]])
    d2 = jnp.where(m[:, None], (tgt - o2) / jnp.linalg.norm(tgt - o2,
                                                            axis=-1,
                                                            keepdims=True), d)
    live_tmin = jnp.where(m, 1e-3, jnp.inf)
    live_tmax = jnp.where(m, jnp.inf, -1.0)
    timed("sweep 1M, 16k live coherent (128 packets)", sweep,
          o2, d2, live_tmin, live_tmax)

    m2 = jnp.arange(n) < (1 << 11)
    tmin3 = jnp.where(m2, 1e-3, jnp.inf)
    tmax3 = jnp.where(m2, jnp.inf, -1.0)
    timed("sweep 1M, 2k live coherent (16 packets)", sweep,
          o2, d2, tmin3, tmax3)

    for pps in (1, 4, 16):
        timed(f"sweep 1M ALL dead pps={pps}",
              lambda o_, d_, a_, b_, pps=pps: sweep(o_, d_, a_, b_, pps),
              o, d, dead_tmin, dead_tmax)

    # the li_path sort step verbatim
    world_lo = pack.world_center - pack.world_radius
    world_inv = 1.0 / jnp.maximum(2.0 * pack.world_radius, 1e-12)
    from jet_pbrt_tpu.ops import rng
    u = rng.lane_keys(0, 0, jnp.arange(n, dtype=jnp.int32))
    active = jax.random.uniform(jax.random.PRNGKey(4), (n,)) < 0.3
    L = jnp.zeros((n, 3))
    beta = jnp.ones((n, 3))
    prev_specular = jnp.zeros((n,), bool)
    prev_pdf = jnp.zeros((n,))
    lane = jnp.arange(n, dtype=jnp.int32)

    def sort_step(active, o_, d_, L, beta, prev_specular, prev_pdf, lane, u):
        skey = sort_ops.ray_sort_key(active, o_, d_, world_lo,
                                     jnp.broadcast_to(world_inv, (3,)))
        perm = jnp.argsort(skey)
        L, beta, o_, d_ = (x[perm] for x in (L, beta, o_, d_))
        active, prev_specular, prev_pdf, lane, u = (
            x[perm] for x in (active, prev_specular, prev_pdf, lane, u))
        return active, o_, d_, L, beta, prev_specular, prev_pdf, lane, u

    timed("li_path sort_step (argsort + 9 gathers)", sort_step,
          active, o, d, L, beta, prev_specular, prev_pdf, lane, u)

    print("u dtype/shape:", u.dtype, u.shape)


if __name__ == "__main__":
    main()
