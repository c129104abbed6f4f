"""Throughput of the HBM-streamed sweep on a synthetic mesh BEYOND the
resident VMEM budget (r4 VERDICT task 8 / r3 task 7: one committed number
for streamed-mode throughput, vs the XLA skip-link walk on the same mesh).

The mesh: ~300k triangles on a displaced sphere (beyond the ~260k-tri
resident cap), coherent camera-style rays. Run on the real chip:

    python scripts/stream_bench.py [n_rays_pow2=18]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def synth_mesh(t=300_000, seed=0):
    """Triangle fans over a bumpy sphere, ~uniform area."""
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 1, t)
    v = rng.uniform(0, 1, t)
    theta = np.arccos(1 - 2 * u)
    phi = 2 * np.pi * v
    r = 10.0 * (1.0 + 0.15 * np.sin(6 * theta) * np.cos(5 * phi))
    c = np.stack([r * np.sin(theta) * np.cos(phi),
                  r * np.sin(theta) * np.sin(phi),
                  r * np.cos(theta)], axis=1).astype(np.float32)
    e1 = rng.normal(0, 0.05, (t, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.05, (t, 3)).astype(np.float32)
    return np.stack([c, c + e1, c + e2], axis=1)


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)
    from jet_pbrt_tpu.ops import sweep_bvh as S
    from jet_pbrt_tpu.ops import bvh as bvh_ops

    tris = synth_mesh()
    p0, p1, p2 = tris[:, 0], tris[:, 1], tris[:, 2]
    bvh, order = bvh_ops.build_bvh(p0, p1, p2, leaf_size=16)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    mt = np.concatenate([p0, p1 - p0, p2 - p0], axis=1).astype(np.float32)
    nodes = jnp.asarray(bvh_ops.pack_node_table(bvh, len(order), 16))
    print(f"{len(mt)} tris; fits_vmem={S.fits_vmem(len(mt))}", flush=True)
    assert not S.fits_vmem(len(mt)), "mesh must exceed the resident budget"

    bw, sph, root, ng = S.build_sweep_tables(mt)
    inst = S.flat_inst(np.zeros((0, 3), np.float32), np.zeros(0, np.float32))
    bwj, sphj, rootj, instj = (jnp.asarray(bw), jnp.asarray(sph),
                               jnp.asarray(root), jnp.asarray(inst))

    # coherent camera-ish rays toward the sphere
    rng_ = np.random.default_rng(1)
    o = np.tile(np.array([40.0, 25.0, 30.0], np.float32), (n, 1))
    tgt = rng_.uniform(-9, 9, (n, 3)).astype(np.float32)
    tgt = tgt[np.argsort((tgt * 1000).astype(np.int64)[:, 0], kind="stable")]
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), jnp.inf)

    def stream(o_, d_, a, b):
        return S.intersect_sweep(sphj, bwj, instj, rootj, len(mt), ng,
                                 o_, d_, a, b, stream_bw=True).t

    def xla(o_, d_, a, b):
        return bvh_ops.intersect_bvh(nodes, jnp.asarray(mt), o_, d_, a, b,
                                     leaf_size=16).t

    for label, fn in (("streamed sweep", stream), ("xla walk", xla)):
        f = jax.jit(fn)
        out = f(oj, dj, tmin, tmax)
        _ = float(jnp.asarray(out)[0])
        reps = 4
        t0 = time.perf_counter()
        for _i in range(reps):
            out = f(oj, dj, tmin, tmax)
        _ = float(jnp.asarray(out)[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:<16} {dt*1e3:9.2f} ms  "
              f"({n/dt/1e6:.1f} M rays/s closest-hit)", flush=True)


if __name__ == "__main__":
    main()
