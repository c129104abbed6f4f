"""Micro-benchmark: where do the ~650ns/iteration go in the wide kernel?

Variants pop N pre-filled stack entries (real node codes) per tile:
  v0: pop only (loop + SMEM + cond overhead)
  v1: + node fetch (bf16 one-hot matmul)
  v2: + 8 slab tests
  v3: + per-child packed-key lane reduces + (1,8) min + 8 scalar extracts
  v4: + Batcher sort + 8 template loads + 8 dump-slot pushes (full internal)
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jet_pbrt_tpu.scene.scenes import bunny_scene
from jet_pbrt_tpu.ops import wide_bvh as W

scene = bunny_scene(bvh_leaf_size=16)
pack = scene.pack
meta_tbl = pack.inst_w_meta
bounds_pl = pack.inst_w_bounds
NNODE = 1076
NPOP = 512          # entries per tile
NTILES = 256

rng = np.random.default_rng(0)
codes = rng.integers(0, NNODE, (NTILES, W.STACK_CAP)).astype(np.int32)
codes_j = jnp.asarray(codes)


def kern(codes_ref, bounds_ref, meta_ref, out_ref, stack_ref, tstack_ref,
         *, level):
    iota_lane = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ox = jnp.zeros((8, 128), jnp.float32)
    ix = jnp.full((8, 128), 1.7, jnp.float32)
    capl = jnp.full((8, 128), 1e30, jnp.float32)

    for i in range(W.STACK_CAP):
        stack_ref[i] = codes_ref[0, i]
        tstack_ref[i] = jnp.int32(0)

    def fetch(table_ref, row_idx):
        blk = pl.multiple_of((row_idx // 128) * 128, 128)
        cols = table_ref[:, pl.ds(blk, 128)]
        onehot = (iota_lane == row_idx % 128).astype(jnp.bfloat16)
        return jnp.dot(cols, onehot, preferred_element_type=jnp.float32)

    def body(carry):
        sp, acc = carry
        sp1 = sp - 1
        code = stack_ref[sp1]
        te = tstack_ref[sp1]
        acc = acc + te
        if level == 0:
            return sp1, acc + code
        nb = fetch(bounds_ref, code)
        if level == 1:
            return sp1, acc + jnp.int32(nb[0, 0])
        cols = []
        for k in range(8):
            t0x = (nb[6*k+0:6*k+1, :] - ox) * ix
            t0y = (nb[6*k+1:6*k+2, :] - ox) * ix
            t0z = (nb[6*k+2:6*k+3, :] - ox) * ix
            t1x = (nb[6*k+3:6*k+4, :] - ox) * ix
            t1y = (nb[6*k+4:6*k+5, :] - ox) * ix
            t1z = (nb[6*k+5:6*k+6, :] - ox) * ix
            t_en = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            t_ex = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            hit = (t_en <= t_ex) & (t_en < capl)
            x = jnp.where(hit, jnp.maximum(t_en, 0.0), W.FAR)
            xk = (lax.bitcast_convert_type(x, jnp.int32) & ~7) | k
            if level >= 3:
                cols.append(jnp.min(xk, axis=1, keepdims=True))
            else:
                cols.append(xk[:, :1])
        if level == 2:
            return sp1, acc + jnp.int32(cols[0][0, 0])
        keys = jnp.min(jnp.concatenate(cols, axis=1), axis=0, keepdims=True)
        kv = [keys[0, k] for k in range(8)]
        if level == 3:
            a = kv[0]
            for k in range(1, 8):
                a = a + kv[k]
            return sp1, acc + a
        for i, j in W._SORT8:
            a = jnp.minimum(kv[i], kv[j])
            b = jnp.maximum(kv[i], kv[j])
            kv[i], kv[j] = a, b
        off = jnp.int32(0)
        for j, k in enumerate(range(7, -1, -1)):
            kk = kv[k]
            slot = kk & 7
            tmpl = meta_ref[code * 8 + slot]
            ok = (kk < W.FAR_KEY_MIN) & (tmpl != -1)
            ov = tmpl >> 26
            e = (jnp.where(ov > 0, ov, 1) << 26) | (tmpl & W.ENTRY_MASK)
            # push to DUMP slots only so the loop still drains
            addr = jnp.int32(W.STACK_CAP + j)
            stack_ref[addr] = e
            tstack_ref[addr] = kk & ~7
            off = off + ok.astype(jnp.int32)
        return sp1, acc + off

    sp, acc = lax.while_loop(lambda c: c[0] > 0,
                             body, (jnp.int32(NPOP), jnp.int32(0)))
    out_ref[0, 0] = acc


def run(level):
    k = functools.partial(kern, level=level)
    f = pl.pallas_call(
        k,
        grid=(NTILES,),
        in_specs=[
            pl.BlockSpec((1, W.STACK_CAP), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(bounds_pl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(meta_tbl.shape, lambda i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((NTILES, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((W.STACK_CAP + 8,), jnp.int32),
                        pltpu.SMEM((W.STACK_CAP + 8,), jnp.int32)],
    )
    g = jax.jit(lambda c: f(c, bounds_pl, meta_tbl))
    r = g(codes_j)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = g(codes_j)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 3
    per_iter = dt / (NTILES * NPOP)
    print(f"level {level}: {dt*1e3:7.2f} ms  {per_iter*1e9:7.1f} ns/pop",
          flush=True)


for lv in range(5):
    run(lv)
