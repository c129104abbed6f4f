"""Primitive-cost micro benchmarks for the wide kernel redesign.

Measures, inside one pallas kernel with a fori_loop of N reps:
  m1:  one-hot build + [48,128]@[128,128] bf16 matmul (today's node fetch)
  m4:  4 independent fetches per iteration (do they pipeline?)
  b1:  batched [48,1152]@[1152,128] full-table fetch of 4 nodes
  r1:  8 sublane-reduces + 1 lane-reduce + 8 extracts (key path)
  x8:  8 scalar extracts from a (8,1) vector only
  f1:  f32 HIGHEST [144,128]@[128,128] (today's leaf fetch)
  f3:  bf16 3-plane [144,128]@[128,128] x3 + adds (split leaf fetch)
  mt:  16 Moller-Trumbore tests on (8,128) rows (leaf vector work)
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 2048


def run(name, kern, tables):
    f = pl.pallas_call(
        kern,
        grid=(8,),
        in_specs=[pl.BlockSpec(t.shape, lambda i: tuple(0 for _ in t.shape),
                               memory_space=pltpu.VMEM) for t in tables],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
    )
    g = jax.jit(lambda *ts: f(*ts))
    r = g(*tables)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = g(*tables)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 10 / 8 / REPS
    print(f"{name}: {dt*1e9:8.1f} ns/iter", flush=True)


def main():
    rng = np.random.default_rng(0)
    tb_bf16 = jnp.asarray(rng.normal(size=(48, 1152)).astype(np.float32)
                          ).astype(jnp.bfloat16)
    tf32 = jnp.asarray(rng.normal(size=(144, 4224)).astype(np.float32))
    tb3 = jnp.asarray(rng.normal(size=(3 * 144, 4224)).astype(np.float32)
                      ).astype(jnp.bfloat16)

    iota = lambda: lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    iota_big = lambda r: lax.broadcasted_iota(jnp.int32, (r, 128), 0)

    def loop(body, out_ref, smem):
        acc = lax.fori_loop(0, REPS, body, jnp.float32(0.0))
        out_ref[0] = jnp.full((8, 128), acc, jnp.float32)

    def k_m1(t_ref, out_ref, smem):
        it = iota()
        def body(i, acc):
            idx = (i * 37) % 1100
            blk = pl.multiple_of((idx // 128) * 128, 128)
            cols = t_ref[:, pl.ds(blk, 128)]
            oh = (it == idx % 128).astype(jnp.bfloat16)
            nb = jnp.dot(cols, oh, preferred_element_type=jnp.float32)
            return acc + nb[0, 0]
        loop(body, out_ref, smem)

    def k_m4(t_ref, out_ref, smem):
        it = iota()
        def body(i, acc):
            for j in range(4):
                idx = (i * 37 + j * 263) % 1100
                blk = pl.multiple_of((idx // 128) * 128, 128)
                cols = t_ref[:, pl.ds(blk, 128)]
                oh = (it == idx % 128).astype(jnp.bfloat16)
                nb = jnp.dot(cols, oh, preferred_element_type=jnp.float32)
                acc = acc + nb[0, 0]
            return acc
        loop(body, out_ref, smem)

    def k_b1(t_ref, out_ref, smem):
        it = iota_big(1152)
        def body(i, acc):
            codes = jnp.zeros((1, 128), jnp.int32)
            for j in range(4):
                idx = (i * 37 + j * 263) % 1100
                lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                codes = jnp.where(lane == j, idx, codes)
            oh = (it == codes).astype(jnp.bfloat16)
            nb = jnp.dot(t_ref[:, :1152], oh,
                         preferred_element_type=jnp.float32)
            s = 0.0
            for j in range(4):
                bj = jnp.broadcast_to(nb[:, j:j + 1], (48, 128))
                s = s + bj[0, 0]
            return acc + s
        loop(body, out_ref, smem)

    def k_r1(t_ref, out_ref, smem):
        def body(i, acc):
            mins = []
            for k in range(8):
                xk = jnp.full((8, 128), 1.0 * k, jnp.float32) + acc
                mins.append(jnp.min(xk, axis=0, keepdims=True))
            kmat = jnp.concatenate(mins, axis=0)
            kcol = jnp.min(kmat, axis=1, keepdims=True)
            s = 0.0
            for k in range(8):
                s = s + kcol[k, 0]
            return acc + s * 1e-9
        loop(body, out_ref, smem)

    def k_x8(t_ref, out_ref, smem):
        def body(i, acc):
            blk = pl.multiple_of(((i * 37) % 1100 // 128) * 128, 128)
            vv = t_ref[:8, pl.ds(blk, 128)].astype(jnp.float32)
            s = 0.0
            for k in range(8):
                s = s + vv[k, 0]
            return acc + s * 1e-9
        loop(body, out_ref, smem)

    def k_x32(t_ref, out_ref, smem):
        def body(i, acc):
            blk = pl.multiple_of(((i * 37) % 1100 // 128) * 128, 128)
            vv = t_ref[:8, pl.ds(blk, 128)].astype(jnp.float32)
            s = 0.0
            for k in range(8):
                for l in range(4):
                    s = s + vv[k, l]
            return acc + s * 1e-9
        loop(body, out_ref, smem)

    def k_r2(t_ref, out_ref, smem):
        """Real reduce chain: 8 sublane-reduces from table data + lane
        reduce + 8 extracts (the in-kernel key path, not foldable)."""
        def body(i, acc):
            blk = pl.multiple_of(((i * 37) % 1100 // 128) * 128, 128)
            base = t_ref[:, pl.ds(blk, 128)].astype(jnp.float32)
            mins = []
            for k in range(8):
                xk = base[6 * k:6 * k + 8, :] + acc
                mins.append(jnp.min(xk, axis=0, keepdims=True))
            kmat = jnp.concatenate(mins, axis=0)
            kcol = jnp.min(kmat, axis=1, keepdims=True)
            s = 0.0
            for k in range(8):
                s = s + kcol[k, 0]
            return acc + s * 1e-9
        loop(body, out_ref, smem)

    def k_srt(t_ref, out_ref, smem):
        """Extract 8 + scalar Batcher sort + 8 SMEM stores."""
        SORT8 = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6),
                 (5, 7), (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6),
                 (1, 4), (3, 6), (2, 4), (3, 5), (3, 4)]
        def body(i, acc):
            blk = pl.multiple_of(((i * 37) % 1100 // 128) * 128, 128)
            vv = lax.bitcast_convert_type(
                t_ref[:8, pl.ds(blk, 128)].astype(jnp.float32), jnp.int32)
            kv = [vv[k, 0] for k in range(8)]
            for a, b in SORT8:
                lo = jnp.minimum(kv[a], kv[b])
                hi = jnp.maximum(kv[a], kv[b])
                kv[a], kv[b] = lo, hi
            s = jnp.int32(0)
            for k in range(8):
                smem[8 * (i % 4) + k] = kv[k]
                s = s + kv[k]
            return acc + s.astype(jnp.float32) * 1e-9
        loop(body, out_ref, smem)

    def k_f1(t_ref, out_ref, smem):
        it = iota()
        def body(i, acc):
            idx = (i * 37) % 4200
            blk = pl.multiple_of((idx // 128) * 128, 128)
            cols = t_ref[:, pl.ds(blk, 128)]
            oh = (it == idx % 128).astype(jnp.float32)
            tr = jnp.dot(cols, oh, preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
            return acc + tr[0, 0]
        loop(body, out_ref, smem)

    def k_f3(t_ref, out_ref, smem):
        it = iota()
        def body(i, acc):
            idx = (i * 37) % 4200
            blk = pl.multiple_of((idx // 128) * 128, 128)
            oh = (it == idx % 128).astype(jnp.bfloat16)
            tr = jnp.float32(0.0)
            for p in range(3):
                cols = t_ref[pl.ds(144 * p, 144), pl.ds(blk, 128)]
                tr = tr + jnp.dot(cols, oh,
                                  preferred_element_type=jnp.float32)
            return acc + tr[0, 0]
        loop(body, out_ref, smem)

    def k_mt(t_ref, out_ref, smem):
        d0 = jnp.full((8, 128), 0.3, jnp.float32)
        def body(i, acc):
            tr = jnp.full((144, 128), 0.5, jnp.float32) + acc
            tws = []
            for k in range(16):
                r = 9 * k
                row = lambda a: tr[r + a:r + a + 1, :]
                px = d0 * row(8) - d0 * row(7)
                py = d0 * row(6) - d0 * row(8)
                pz = d0 * row(7) - d0 * row(6)
                det = row(3) * px + row(4) * py + row(5) * pz
                invd = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tx = d0 - row(0)
                ty = d0 - row(1)
                tz = d0 - row(2)
                uu = (tx * px + ty * py + tz * pz) * invd
                qx = ty * row(5) - tz * row(4)
                qy = tz * row(3) - tx * row(5)
                qz = tx * row(4) - ty * row(3)
                vv = (d0 * qx + d0 * qy + d0 * qz) * invd
                tt = (row(6) * qx + row(7) * qy + row(8) * qz) * invd
                ok = (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 0)
                tws.append(jnp.where(ok, tt, jnp.inf))
            t_min = tws[0]
            for k in range(1, 16):
                t_min = jnp.minimum(t_min, tws[k])
            return acc + t_min[0, 0] * 1e-9
        loop(body, out_ref, smem)

    which = sys.argv[1:] or ["m1", "m4", "b1", "r1", "x8", "f1", "f3", "mt"]
    all_k = dict(m1=(k_m1, [tb_bf16]), m4=(k_m4, [tb_bf16]),
                 b1=(k_b1, [tb_bf16]), r1=(k_r1, [tb_bf16]),
                 x8=(k_x8, [tb_bf16]), x32=(k_x32, [tb_bf16]),
                 r2=(k_r2, [tb_bf16]), srt=(k_srt, [tb_bf16]),
                 f1=(k_f1, [tf32]), f3=(k_f3, [tb3]), mt=(k_mt, [tf32]))
    for w in which:
        k, t = all_k[w]
        run(w, k, t)


if __name__ == "__main__":
    main()
