"""Pallas packet BVH traversal — the hot kernel for large meshes.

Why: XLA lowers per-lane gathers to ~3ms per step at wave size (measured on
v5e for a [137k,8] node table at 262k indices), which makes the pure-XLA
skip-link traversal in ops/bvh.py unusable for 100k+ triangle scenes. TPU
has no per-lane gather hardware; the TPU-native formulation is *packet*
traversal: a tile of rays walks the tree in lockstep behind ONE scalar node
pointer, so node fetches are scalar-driven VMEM reads and every test is a
full-width vector op over the tile. A tile descends when ANY of its live
rays hits the node's box — the classic coherent-packet scheme from CPU SIMD
ray tracing; camera and shadow tiles are coherent, diffuse bounces cost
more but stay correct.

Mosaic constraints shape the data plumbing (each discovered the hard way):
  * [B,8] row tables tile the 8-wide minor dim up to 128 lanes -> 16x VMEM
    waste; tables are therefore PLANAR [fields, count] with the big axis in
    lanes.
  * lane-dim dynamic slices must be 128-aligned -> we slice the aligned
    128-wide block containing the wanted row (pl.multiple_of) ...
  * ... and broadcast the wanted lane to all lanes with a one-hot MXU
    matmul (block @ outer(onehot_lane, ones)), because vector[1,1]->[8,128]
    broadcasts are unsupported; the result's [1,128] rows broadcast over
    sublanes natively.

The planar node/tri tables must fit in VMEM alongside the ray tile; callers
gate on `fits_vmem`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import LEAF_SIZE
from .intersect import KindHit

# ray tile per grid step: 8 sublanes x 128 lanes
TILE_S, TILE_L = 8, 128
TILE = TILE_S * TILE_L
_VMEM_BUDGET = 14 * 1024 * 1024


def fits_vmem(n_nodes: int, n_tris: int) -> bool:
    pad = lambda x: ((x + 127) // 128) * 128
    return (pad(n_nodes) * 8 + pad(n_tris) * 9) * 4 <= _VMEM_BUDGET


def planar_tables(bvh_nodes, bvh_tris):
    """[B,8]/[T,9] row tables -> lane-padded planar [8,Bp]/[9,Tp]."""
    import numpy as np

    def planar(t):
        a = np.asarray(t).T
        padc = (-a.shape[1]) % 128
        return np.pad(a, ((0, 0), (0, padc)))

    return planar(bvh_nodes), planar(bvh_tris)


def _fetch_bcast(table_ref, row_idx, n_fields):
    """Fetch row `row_idx` (scalar) of a planar [F, Np] table and broadcast
    each field across all 128 lanes. Returns [F, 128]."""
    blk = pl.multiple_of((row_idx // 128) * 128, 128)
    cols = table_ref[:, pl.ds(blk, 128)]                      # [F,128]
    lane = row_idx % 128
    onehot = (
        lax.broadcasted_iota(jnp.int32, (128, 128), 0) == lane
    ).astype(jnp.float32)
    # M[f, j] = cols[f, lane] for every lane j. precision=HIGHEST is
    # load-bearing: the default MXU matmul rounds f32 operands to bf16,
    # which corrupts int-valued control fields (e.g. miss link 533 -> 532)
    # and sends the traversal into a cycle (observed as a device hang).
    return jnp.dot(cols, onehot, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)


def _kernel(nodes_ref, tris_ref, rays_ref, t_ref, idx_ref, *,
            n_nodes, n_tris, leaf_size, occlusion=False):
    """rays_ref: [1, 8, TILE_S, TILE_L] with fields
    (ox, oy, oz, dx, dy, dz, tmin, tmax)."""
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    tmin = rays_ref[0, 6]
    tmax = rays_ref[0, 7]
    eps = jnp.float32(1e-12)
    ix = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)

    def row1(m, k):
        """[1,128] field row -> broadcasts over sublanes against [8,128]."""
        return m[k : k + 1, :]

    def body(state):
        node, t_best, idx_best = state
        nb = _fetch_bcast(nodes_ref, node, 8)                 # [8,128]
        t0x = (row1(nb, 0) - ox) * ix
        t0y = (row1(nb, 1) - oy) * iy
        t0z = (row1(nb, 2) - oz) * iz
        t1x = (row1(nb, 3) - ox) * ix
        t1y = (row1(nb, 4) - oy) * iy
        t1z = (row1(nb, 5) - oz) * iz
        t_enter = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        t_exit = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        hit_vec = (t_enter <= t_exit) & (t_exit > tmin) & (
            t_enter < jnp.minimum(tmax, t_best)
        )
        any_hit = jnp.any(hit_vec)

        # control scalars: all 128 lanes hold the same value, so a max
        # reduction recovers it exactly (a sum/128 would round in f32 for
        # leaf codes > 2^24/128)
        miss_link = jnp.max(row1(nb, 6)).astype(jnp.int32)
        leaf_code = jnp.max(row1(nb, 7)).astype(jnp.int32)
        is_leaf = leaf_code >= 0
        first = (jnp.maximum(leaf_code, 0) // 32) * leaf_size
        count = jnp.maximum(leaf_code, 0) % 32

        def do_leaf(carry):
            t_b, i_b = carry
            for k in range(leaf_size):
                ti = jnp.minimum(first + k, n_tris - 1)
                tb = _fetch_bcast(tris_ref, ti, 9)            # [9,128]
                e2x = row1(tb, 6)
                e2y = row1(tb, 7)
                e2z = row1(tb, 8)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                e1x = row1(tb, 3)
                e1y = row1(tb, 4)
                e1z = row1(tb, 5)
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tx = ox - row1(tb, 0)
                ty = oy - row1(tb, 1)
                tz = oz - row1(tb, 2)
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (
                    (k < count)
                    & (jnp.abs(det) > 1e-12)
                    & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt > tmin) & (tt < jnp.minimum(tmax, t_b))
                )
                t_b = jnp.where(ok, 0.0 if occlusion else tt, t_b)
                i_b = jnp.where(ok, ti, i_b)
            return t_b, i_b

        t_best, idx_best = lax.cond(
            any_hit & is_leaf, do_leaf, lambda c: c, (t_best, idx_best)
        )
        node = jnp.where(any_hit & jnp.logical_not(is_leaf), node + 1,
                         miss_link)
        return node, t_best, idx_best

    def cond(state):
        return state[0] < n_nodes

    node0 = jnp.int32(0)
    t0 = jnp.full((TILE_S, TILE_L), jnp.inf, jnp.float32)
    i0 = jnp.zeros((TILE_S, TILE_L), jnp.int32)
    _, t_best, idx_best = lax.while_loop(cond, body, (node0, t0, i0))
    t_ref[0] = t_best
    idx_ref[0] = idx_best


def _kernel_inst(tlas_ref, nodes_ref, tris_ref, inst_ref, rays_ref,
                 t_ref, idx_ref, *, n_tlas, n_nodes, n_tris, leaf_size,
                 occlusion=False):
    """Two-level (TLAS -> instance -> BLAS) packet traversal.

    Flat state machine: each iteration the tile takes one step in whichever
    tree it is currently walking. Entering a TLAS leaf loads that instance's
    (offset, scale) as broadcast scalars and switches to the shared BLAS with
    the ray re-expressed in instance space (o' = (o-off)/s, d unchanged,
    t' = t/s); finishing the BLAS resumes the TLAS at the leaf's miss link.
    t_best/idx are kept in world units so TLAS pruning stays tight across
    instances."""
    ox = rays_ref[0, 0]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    tmin = rays_ref[0, 6]
    tmax = rays_ref[0, 7]
    eps = jnp.float32(1e-12)
    ix = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)

    def row1(m, k):
        return m[k : k + 1, :]

    def slab(nb, px, py, pz, lo, hi):
        """Slab test of node row `nb` against per-lane origins (px,py,pz)
        and interval (lo, hi); shares (ix, iy, iz) since d is unscaled."""
        t0x = (row1(nb, 0) - px) * ix
        t0y = (row1(nb, 1) - py) * iy
        t0z = (row1(nb, 2) - pz) * iz
        t1x = (row1(nb, 3) - px) * ix
        t1y = (row1(nb, 4) - py) * iy
        t1z = (row1(nb, 5) - pz) * iz
        t_enter = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        t_exit = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        return (t_enter <= t_exit) & (t_exit > lo) & (t_enter < hi)

    def body(state):
        (tnode, inb, bnode, inst, offx, offy, offz, scl,
         t_best, idx_best) = state

        def tlas_step(st):
            (tnode, inb, bnode, inst, offx, offy, offz, scl,
             t_best, idx_best) = st
            nb = _fetch_bcast(tlas_ref, tnode, 8)
            hit_vec = slab(nb, ox, oy, oz, tmin, jnp.minimum(tmax, t_best))
            any_hit = jnp.any(hit_vec)
            miss_link = jnp.max(row1(nb, 6)).astype(jnp.int32)
            leaf_code = jnp.max(row1(nb, 7)).astype(jnp.int32)
            is_leaf = leaf_code >= 0
            enter = any_hit & is_leaf
            inst_new = jnp.maximum(leaf_code, 0) // 32
            ib = _fetch_bcast(inst_ref, inst_new, 4)
            offx = jnp.where(enter, jnp.max(row1(ib, 0)), offx)
            offy = jnp.where(enter, jnp.max(row1(ib, 1)), offy)
            offz = jnp.where(enter, jnp.max(row1(ib, 2)), offz)
            scl = jnp.where(enter, jnp.max(row1(ib, 3)), scl)
            inst = jnp.where(enter, inst_new, inst)
            # resume point after the BLAS finishes = this leaf's miss link
            tnode = jnp.where(any_hit & jnp.logical_not(is_leaf),
                              tnode + 1, miss_link)
            return (tnode, enter.astype(jnp.int32), jnp.int32(0), inst,
                    offx, offy, offz, scl, t_best, idx_best)

        def blas_step(st):
            (tnode, inb, bnode, inst, offx, offy, offz, scl,
             t_best, idx_best) = st
            inv = 1.0 / scl
            oxl = (ox - offx) * inv
            oyl = (oy - offy) * inv
            ozl = (oz - offz) * inv
            tmin_l = tmin * inv
            tcap_l = jnp.minimum(tmax, t_best) * inv
            nb = _fetch_bcast(nodes_ref, bnode, 8)
            hit_vec = slab(nb, oxl, oyl, ozl, tmin_l, tcap_l)
            any_hit = jnp.any(hit_vec)
            miss_link = jnp.max(row1(nb, 6)).astype(jnp.int32)
            leaf_code = jnp.max(row1(nb, 7)).astype(jnp.int32)
            is_leaf = leaf_code >= 0
            first = (jnp.maximum(leaf_code, 0) // 32) * leaf_size
            count = jnp.maximum(leaf_code, 0) % 32

            def do_leaf(carry):
                t_b, i_b = carry
                for k in range(leaf_size):
                    ti = jnp.minimum(first + k, n_tris - 1)
                    tb = _fetch_bcast(tris_ref, ti, 9)
                    e2x = row1(tb, 6)
                    e2y = row1(tb, 7)
                    e2z = row1(tb, 8)
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    e1x = row1(tb, 3)
                    e1y = row1(tb, 4)
                    e1z = row1(tb, 5)
                    det = e1x * px + e1y * py + e1z * pz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                    tx = oxl - row1(tb, 0)
                    ty = oyl - row1(tb, 1)
                    tz = ozl - row1(tb, 2)
                    uu = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    vv = (dx * qx + dy * qy + dz * qz) * inv_det
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    t_w = tt * scl
                    ok = (
                        (k < count)
                        & (jnp.abs(det) > 1e-12)
                        & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                        & (tt > tmin_l)
                        & (t_w < jnp.minimum(tmax, t_b))
                    )
                    t_b = jnp.where(ok, 0.0 if occlusion else t_w, t_b)
                    i_b = jnp.where(ok, inst * n_tris + ti, i_b)
                return t_b, i_b

            t_best, idx_best = lax.cond(
                any_hit & is_leaf, do_leaf, lambda c: c, (t_best, idx_best)
            )
            bnode = jnp.where(any_hit & jnp.logical_not(is_leaf),
                              bnode + 1, miss_link)
            inb = jnp.where(bnode >= n_nodes, jnp.int32(0), inb)
            return (tnode, inb, bnode, inst, offx, offy, offz, scl,
                    t_best, idx_best)

        return lax.cond(inb > 0, blas_step, tlas_step, state)

    def cond(state):
        return (state[0] < n_tlas) | (state[1] > 0)

    z = jnp.float32(0.0)
    st0 = (
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
        z, z, z, jnp.float32(1.0),
        jnp.full((TILE_S, TILE_L), jnp.inf, jnp.float32),
        jnp.zeros((TILE_S, TILE_L), jnp.int32),
    )
    out = lax.while_loop(cond, body, st0)
    t_ref[0] = out[8]
    idx_ref[0] = out[9]


def _rays_tiles(o, d, tmin, tmax):
    """Pack a ray batch into [n_tiles, 8, TILE_S, TILE_L] field tiles, with
    dead padding (tmin=+inf fails every slab test; tmax=-1 keeps triangle
    tests off)."""
    n = o.shape[0]
    pad = (-n) % TILE
    n_tiles = (n + pad) // TILE

    def pad1(x, fill):
        return jnp.pad(x, ((0, pad),), constant_values=fill)

    fields = jnp.stack([
        pad1(o[:, 0], 0.0), pad1(o[:, 1], 0.0), pad1(o[:, 2], 0.0),
        pad1(d[:, 0], 1.0), pad1(d[:, 1], 0.0), pad1(d[:, 2], 0.0),
        pad1(tmin, jnp.inf), pad1(tmax, -1.0),
    ])                                           # [8, n_pad]
    return fields.reshape(8, n_tiles, TILE_S, TILE_L).swapaxes(0, 1)


def intersect_instanced_pallas(tlas_planar, nodes_planar, tris_planar,
                               inst_planar, n_tlas, n_nodes, n_tris,
                               o, d, tmin, tmax, interpret: bool = False,
                               leaf_size: int = LEAF_SIZE,
                               any_hit: bool = False) -> KindHit:
    """Two-level instanced packet traversal (see _kernel_inst).

    Hit indices are encoded instance * n_tris + triangle, matching
    ops/bvh.py intersect_instances."""
    n = o.shape[0]
    rays = _rays_tiles(o, d, tmin, tmax)
    n_tiles = rays.shape[0]

    kernel = functools.partial(
        _kernel_inst, n_tlas=n_tlas, n_nodes=n_nodes, n_tris=n_tris,
        leaf_size=leaf_size, occlusion=any_hit,
    )
    kp = tlas_planar.shape[1]
    bp = nodes_planar.shape[1]
    tp = tris_planar.shape[1]
    ip = inst_planar.shape[1]
    t_out, idx_out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, ip), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TILE_S, TILE_L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_S, TILE_L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_S, TILE_L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tlas_planar, nodes_planar, tris_planar, inst_planar, rays)

    t = t_out.reshape(-1)[:n]
    idx = idx_out.reshape(-1)[:n]
    return KindHit(t=t, index=idx, valid=jnp.isfinite(t))


def intersect_bvh_pallas(nodes_planar, tris_planar, n_nodes, n_tris,
                         o, d, tmin, tmax, interpret: bool = False,
                         leaf_size: int = LEAF_SIZE,
                         any_hit: bool = False) -> KindHit:
    """Packet-traversal closest hit.

    nodes_planar: [8, Bp], tris_planar: [9, Tp] from `planar_tables`;
    n_nodes/n_tris are the unpadded counts.
    """
    n = o.shape[0]
    rays = _rays_tiles(o, d, tmin, tmax)
    n_tiles = rays.shape[0]

    kernel = functools.partial(_kernel, n_nodes=n_nodes, n_tris=n_tris,
                               leaf_size=leaf_size, occlusion=any_hit)
    bp = nodes_planar.shape[1]
    tp = tris_planar.shape[1]
    t_out, idx_out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, bp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TILE_S, TILE_L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_S, TILE_L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_S, TILE_L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(nodes_planar, tris_planar, rays)

    t = t_out.reshape(-1)[:n]
    idx = idx_out.reshape(-1)[:n]
    return KindHit(t=t, index=idx, valid=jnp.isfinite(t))
