"""8-wide BVH: host-side collapse + distance-ordered Pallas packet traversal.

Round-3 replacement for the serial skip-link packet kernel (the r2
`ops/pallas_bvh.py` walked ONE binary node per iteration in pure DFS-preorder
order, which measured ~1M rays/s on the 66k-tri bunny BLAS — 1% of target).
The TPU-native fix is to make every iteration do 8x the vector work and
visit far fewer nodes:

  * the binary BVH (median or native binned-SAH, ops/bvh.py) is collapsed
    host-side into 8-wide nodes — each node stores its children's AABBs, so
    one fetch + 8 slab tests over the whole ray tile replaces 8 fetch/test
    iterations (reference analogue: the recursive 2-wide walk of
    src/bvh.h:94-146);
  * traversal is *distance-ordered*: per popped node the packet slab-tests
    all 8 children, sorts the hit children by packet-nearest entry distance
    (scalar sorting network), and pushes them far-to-near onto an SMEM
    stack, so the near subtree tightens t_best before the far subtree is
    visited and far entries are skipped on pop when their recorded entry
    distance already exceeds the packet's best-hit bound;
  * child bookkeeping (empty/internal/leaf/instance codes) lives in an SMEM
    int32 side table, read with scalar loads — no f32-encoded control fields
    and no per-field vector reductions;
  * two-level scenes (TLAS over instances + one shared BLAS) run in the same
    kernel: TLAS nodes sit at the front of the table, their leaf children
    push (BLAS root, instance id) entries, and each pop re-derives the
    instance-space ray from a tiny instance table fetch. Instance transform
    is (uniform scale, translation); t/idx bookkeeping stays in world units.

Data plumbing mirrors ops/pallas_bvh.py's discoveries: tables are planar
[fields, count] with the big axis lane-padded to 128, node fetches are a
128-aligned lane slice + one-hot MXU matmul at HIGHEST precision (exact for
0/1 weights), and [1,128] field rows broadcast over sublanes natively.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import KindHit

WIDTH = 8
# child-meta encoding (int32): 0 = empty; 1..INST_BASE-1 = internal child
# (index m-1); >= INST_BASE = instance leaf (inst = m - INST_BASE);
# < 0 = triangle leaf (v = -m-1; first = (v>>5)*leaf_size; count = v & 31)
INST_BASE = 1 << 24
# stack-entry encoding (int32): (inst+1) << 26 | code;
# code < LEAF_BIT = internal node index, code >= LEAF_BIT = leaf (code-LEAF_BIT
# is the tri-leaf v). inst = -1 means world space (TLAS / non-instanced).
LEAF_BIT = 1 << 25
ENTRY_MASK = (1 << 26) - 1
STACK_CAP = 192   # worst case ~7 * tree depth; 8-wide depth <= ~10 for 2^25 tris
FAR = np.float32(3.0e37)

# ray tile: 8 sublanes x 128 lanes (one VPU register of rays)
TILE_S, TILE_L = 8, 128
TILE = TILE_S * TILE_L

_VMEM_BUDGET = 13 * 1024 * 1024
_SMEM_BUDGET = 256 * 1024


def fits_vmem(n_wide_nodes: int, n_tris: int) -> bool:
    """Gate: planar bounds + tris in VMEM, flat meta table in SMEM (SMEM is
    ~1MB/core and pads the trailing dim of 2-D arrays to 128 lanes, so the
    meta table is stored 1-D)."""
    pad = lambda x: ((max(x, 1) + 127) // 128) * 128
    vmem = (pad(n_wide_nodes) * (6 * WIDTH) + pad(n_tris) * 9) * 4
    smem = n_wide_nodes * WIDTH * 4
    return vmem <= _VMEM_BUDGET and smem <= _SMEM_BUDGET


# ---------------------------------------------------------------------------
# host-side collapse: flattened binary skip-link BVH -> 8-wide tables
# ---------------------------------------------------------------------------

def _binary_children(bvh):
    """Recover (left, right) child indices from the DFS-preorder skip-link
    flatten (ops/bvh.py emit): left(i) = i+1, right(i) = miss(i+1)."""
    bmin, bmax, miss, leaf_first, leaf_count = bvh
    n = len(bmin)
    left = np.full(n, -1, np.int64)
    right = np.full(n, -1, np.int64)
    inner = leaf_first < 0
    idx = np.nonzero(inner)[0]
    left[idx] = idx + 1
    right[idx] = miss[np.minimum(idx + 1, n - 1)]
    return left, right


def _half_areas(bmin, bmax):
    e = np.maximum(bmax - bmin, 0.0)
    return e[:, 0] * (e[:, 1] + e[:, 2]) + e[:, 1] * e[:, 2]


def collapse_wide(bvh, leaf_size: int, leaf_meta=None):
    """Collapse a flattened binary BVH into 8-wide nodes.

    leaf_meta(first, count) -> int32 child code; defaults to the triangle
    leaf encoding. Returns (bounds [N8, WIDTH, 6] f32, meta [N8, WIDTH] i32).
    Child order within a node is arbitrary — the kernel distance-orders at
    runtime, so no build-time ordering is needed.
    """
    bmin, bmax, miss, leaf_first, leaf_count = bvh
    if leaf_meta is None:
        def leaf_meta(first, count):
            assert first % leaf_size == 0
            v = (first // leaf_size) * 32 + count
            return -(1 + v)

    left, right = _binary_children(bvh)
    is_leaf = leaf_first >= 0
    area = _half_areas(bmin, bmax) if len(bmin) else np.zeros(0)

    assert leaf_size <= 31, "leaf count field is 5 bits"
    bounds_rows: list[np.ndarray] = []
    meta_rows: list[np.ndarray] = []
    depth_of: list[int] = []

    def new_node(depth: int) -> int:
        bounds_rows.append(np.zeros((WIDTH, 6), np.float32))
        meta_rows.append(np.zeros((WIDTH,), np.int32))
        depth_of.append(depth)
        return len(meta_rows) - 1

    # iterative DFS: (wide_node_id, binary_root)
    root8 = new_node(1)
    work = [(root8, 0)]
    while work:
        w, b = work.pop()
        # grow the member set to WIDTH by splitting the largest internal
        members = [b] if is_leaf[b] else [left[b], right[b]]
        while len(members) < WIDTH:
            pick, best = -1, -1.0
            for j, m in enumerate(members):
                if not is_leaf[m] and area[m] > best:
                    pick, best = j, area[m]
            if pick < 0:
                break
            m = members.pop(pick)
            members.extend((left[m], right[m]))
        for k, m in enumerate(members):
            bounds_rows[w][k, :3] = bmin[m]
            bounds_rows[w][k, 3:] = bmax[m]
            if is_leaf[m]:
                meta_rows[w][k] = leaf_meta(int(leaf_first[m]),
                                            int(leaf_count[m]))
            else:
                c = new_node(depth_of[w] + 1)
                meta_rows[w][k] = 1 + c
                work.append((c, m))
    # stack-safety: each live pop pushes <= WIDTH-1 net entries per level
    max_depth = max(depth_of)
    assert (WIDTH - 1) * max_depth + WIDTH <= STACK_CAP, (
        f"wide-BVH depth {max_depth} can overflow the {STACK_CAP}-entry "
        "traversal stack; rebuild with a larger leaf or raise STACK_CAP"
    )
    return np.stack(bounds_rows), np.stack(meta_rows)


def _planar_bounds(bounds: np.ndarray) -> np.ndarray:
    """[N8, WIDTH, 6] -> lane-padded planar [6*WIDTH, Np] (node axis in
    lanes). Row 6k+a = child k's (lo.xyz, hi.xyz)[a]."""
    n8 = bounds.shape[0]
    a = bounds.reshape(n8, WIDTH * 6).T.astype(np.float32)
    padc = (-a.shape[1]) % 128
    return np.pad(a, ((0, 0), (0, padc)))


def _pad_meta(meta: np.ndarray) -> np.ndarray:
    """[N8, WIDTH] -> flat [N8*WIDTH] (1-D: SMEM pads 2-D trailing dims to
    128 lanes, 16x waste)."""
    return np.ascontiguousarray(meta.reshape(-1))


def _planar_tris(tris: np.ndarray) -> np.ndarray:
    """[T,9] MT rows -> planar [9, Tp]."""
    a = np.asarray(tris, np.float32).T
    padc = (-a.shape[1]) % 128
    return np.pad(a, ((0, 0), (0, padc)))


def _flat_inst(inst_off, inst_scale):
    """SMEM instance table [(I+1)*4] = rows of (off.xyz, scale), with an
    identity row prepended so the kernel indexes (inst+1) and TLAS/world
    pops (inst = -1) read the identity transform."""
    n = len(inst_scale)
    t = np.zeros((n + 1, 4), np.float32)
    t[0, 3] = 1.0
    if n:
        t[1:, :3] = np.asarray(inst_off, np.float32)
        t[1:, 3] = np.asarray(inst_scale, np.float32)
    return np.ascontiguousarray(t.reshape(-1))


def wide_tables(bvh, tris, leaf_size: int):
    """Single-level tables: (bounds_pl [48,Np], meta flat [Nm*8] i32,
    tris_pl [9,Tp], inst flat [4] identity, n_wide, blas_root=0)."""
    bounds, meta = collapse_wide(bvh, leaf_size)
    return (_planar_bounds(bounds), _pad_meta(meta), _planar_tris(tris),
            _flat_inst(np.zeros((0, 3), np.float32), np.zeros(0, np.float32)),
            bounds.shape[0], 0)


def wide_tables_instanced(tlas_bvh, blas_bvh, tris, inst_off, inst_scale,
                          leaf_size: int):
    """Merged two-level tables: TLAS wide nodes first (their tri-leaf slots
    re-encoded as instance leaves), then the shared BLAS wide nodes with
    internal child indices offset. blas_root = number of TLAS wide nodes.

    tlas_bvh must be built with leaf_size=1 over instance world AABBs in
    TLAS order (leaf_first == instance id)."""
    def inst_leaf(first, count):
        assert count == 1
        return INST_BASE + first

    tb, tm = collapse_wide(tlas_bvh, 1, leaf_meta=inst_leaf)
    bb, bm = collapse_wide(blas_bvh, leaf_size)
    n_tlas = tb.shape[0]
    # offset BLAS internal children; instance leaves in TLAS stay as-is
    bm = np.where(np.logical_and(bm > 0, bm < INST_BASE), bm + n_tlas, bm)
    bounds = np.concatenate([tb, bb])
    meta = np.concatenate([tm, bm])
    return (_planar_bounds(bounds), _pad_meta(meta), _planar_tris(tris),
            _flat_inst(inst_off, inst_scale), bounds.shape[0], n_tlas)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

# Batcher odd-even merge sort network for 8 elements (19 comparators)
_SORT8 = [(0, 1), (2, 3), (4, 5), (6, 7),
          (0, 2), (1, 3), (4, 6), (5, 7),
          (1, 2), (5, 6), (0, 4), (3, 7),
          (1, 5), (2, 6),
          (1, 4), (3, 6),
          (2, 4), (3, 5),
          (3, 4)]


def _wide_kernel(meta_ref, bounds_ref, tris_ref, inst_ref, rays_ref,
                 t_ref, idx_ref, *refs,
                 n_tris, leaf_size, blas_root, has_inst, occlusion,
                 with_stats=False):
    """One ray tile [TILE_S, TILE_L] walks the wide BVH behind a shared SMEM
    stack. rays_ref fields: ox oy oz dx dy dz tmin tmax.

    Per-pop bookkeeping is all-scalar: the child meta and the instance
    (off, scale) come from SMEM scalar loads, and the packet's best-hit
    bound is a carried scalar refreshed only when a leaf tightens t_best —
    the only per-pop vector-to-scalar reductions left are the 8 per-child
    packet-nearest distances."""
    if with_stats:
        stats_ref, stack_ref, tstack_ref = refs
    else:
        stack_ref, tstack_ref = refs
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
    iota_lane = lax.broadcasted_iota(jnp.int32, (128, 128), 0)

    def row1(m, k):
        return m[k:k + 1, :]

    def fetch(table_ref, row_idx):
        blk = pl.multiple_of((row_idx // 128) * 128, 128)
        cols = table_ref[:, pl.ds(blk, 128)]
        onehot = (iota_lane == row_idx % 128).astype(jnp.float32)
        return jnp.dot(cols, onehot, preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)

    # root entry: node 0, world space (inst = -1 -> tag 0)
    stack_ref[0] = jnp.int32(0)
    tstack_ref[0] = jnp.float32(0.0)

    def body(carry):
        if with_stats:
            sp, bound, t_best, i_best, n_int, n_leaf = carry
        else:
            sp, bound, t_best, i_best = carry
            n_int = n_leaf = jnp.int32(0)
        sp1 = sp - 1
        entry = stack_ref[sp1]
        te = tstack_ref[sp1]
        inst = (entry >> 26) - 1
        code = entry & ENTRY_MASK
        is_leaf = code >= LEAF_BIT
        live = te < bound

        # instance transform as scalars (identity row at index 0)
        if has_inst:
            ofx = inst_ref[(inst + 1) * 4 + 0]
            ofy = inst_ref[(inst + 1) * 4 + 1]
            ofz = inst_ref[(inst + 1) * 4 + 2]
            scl = inst_ref[(inst + 1) * 4 + 3]
            inv = 1.0 / scl
            oxl = (ox - ofx) * inv
            oyl = (oy - ofy) * inv
            ozl = (oz - ofz) * inv
            tminl = tmin * inv
        else:
            scl = jnp.float32(1.0)
            oxl, oyl, ozl = ox, oy, oz
            tminl = tmin

        def internal(c):
            if with_stats:
                sp_c, bnd, tb, ibst, ni, nl = c
            else:
                sp_c, bnd, tb, ibst = c
                ni = nl = jnp.int32(0)
            capl = jnp.minimum(tmax, tb) * (inv if has_inst else 1.0)
            nb = fetch(bounds_ref, code)                     # [48,128]
            tns = []
            for k in range(WIDTH):
                t0x = (row1(nb, 6 * k + 0) - oxl) * ix
                t0y = (row1(nb, 6 * k + 1) - oyl) * iy
                t0z = (row1(nb, 6 * k + 2) - ozl) * iz
                t1x = (row1(nb, 6 * k + 3) - oxl) * ix
                t1y = (row1(nb, 6 * k + 4) - oyl) * iy
                t1z = (row1(nb, 6 * k + 5) - ozl) * iz
                t_en = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.minimum(t0z, t1z),
                )
                t_ex = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z),
                )
                hit = (t_en <= t_ex) & (t_ex > tminl) & (t_en < capl)
                # packet-nearest entry in WORLD units; FAR = no ray hits
                tns.append(jnp.min(
                    jnp.where(hit, jnp.maximum(t_en, 0.0) * scl, FAR)
                ))
            # child codes -> stack entries (scalar SMEM reads)
            ts = []
            es = []
            for k in range(WIDTH):
                m = meta_ref[code * WIDTH + k]
                is_int = (m > 0) & (m < INST_BASE)
                is_ins = m >= INST_BASE
                e = jnp.where(
                    is_int, ((inst + 1) << 26) | (m - 1),
                    jnp.where(
                        is_ins,
                        ((m - INST_BASE + 1) << 26) | blas_root,
                        ((inst + 1) << 26) | (LEAF_BIT + (-m - 1)),
                    ),
                ).astype(jnp.int32)
                ts.append(jnp.where(m == 0, FAR, tns[k]))
                es.append(e)
            if not occlusion:
                # sort far-to-near so the nearest child is popped first
                # (pointless for any-hit, where the first hit ends the lane)
                for i, j in _SORT8:
                    swap = ts[i] < ts[j]
                    ti = jnp.where(swap, ts[j], ts[i])
                    tj = jnp.where(swap, ts[i], ts[j])
                    ei = jnp.where(swap, es[j], es[i])
                    ej = jnp.where(swap, es[i], es[j])
                    ts[i], ts[j], es[i], es[j] = ti, tj, ei, ej
            # branchless pushes: invalid (FAR) candidates go to dump slots
            off = jnp.int32(0)
            for k in range(WIDTH):
                ok = ts[k] < FAR
                addr = jnp.where(ok, sp_c + off, jnp.int32(STACK_CAP + k))
                stack_ref[addr] = es[k]
                tstack_ref[addr] = ts[k]
                off = off + ok.astype(jnp.int32)
            if with_stats:
                return sp_c + off, bnd, tb, ibst, ni + 1, nl
            return sp_c + off, bnd, tb, ibst

        def leaf(c):
            if with_stats:
                sp_c, bnd, tb, ibst, ni, nl = c
            else:
                sp_c, bnd, tb, ibst = c
                ni = nl = jnp.int32(0)
            v = code - LEAF_BIT
            first = (v >> 5) * leaf_size
            count = v & 31
            cap = jnp.minimum(tmax, tb)
            for k in range(leaf_size):
                ti = first + k
                tr = fetch(tris_ref, ti)                     # [9,128]
                e2x = row1(tr, 6)
                e2y = row1(tr, 7)
                e2z = row1(tr, 8)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                e1x = row1(tr, 3)
                e1y = row1(tr, 4)
                e1z = row1(tr, 5)
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tx = oxl - row1(tr, 0)
                ty = oyl - row1(tr, 1)
                tz = ozl - row1(tr, 2)
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                t_w = tt * scl if has_inst else tt
                ok = (
                    (k < count)
                    & (jnp.abs(det) > 1e-12)
                    & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt > tminl)
                    & (t_w < cap)
                )
                t_w = 0.0 if occlusion else t_w
                cap = jnp.where(ok, t_w, cap)
                tb = jnp.where(ok, t_w, tb)
                iw = jnp.maximum(inst, 0) * n_tris + ti
                ibst = jnp.where(ok, iw, ibst)
            # the packet bound only tightens when a leaf lands hits
            bnd = jnp.max(cap)
            if with_stats:
                return sp_c, bnd, tb, ibst, ni, nl + 1
            return sp_c, bnd, tb, ibst

        def process(c):
            return lax.cond(is_leaf, leaf, internal, c)

        init = ((sp1, bound, t_best, i_best, n_int, n_leaf) if with_stats
                else (sp1, bound, t_best, i_best))
        return lax.cond(live, process, lambda c: c, init)

    def cond(carry):
        return carry[0] > 0

    t0 = jnp.full((TILE_S, TILE_L), jnp.inf, jnp.float32)
    i0 = jnp.zeros((TILE_S, TILE_L), jnp.int32)
    bound0 = jnp.max(tmax)
    if with_stats:
        st0 = (jnp.int32(1), bound0, t0, i0, jnp.int32(0), jnp.int32(0))
        _, _, t_best, i_best, n_int, n_leaf = lax.while_loop(cond, body, st0)
        tile = pl.program_id(0)
        stats_ref[tile, 0] = n_int
        stats_ref[tile, 1] = n_leaf
    else:
        st0 = (jnp.int32(1), bound0, t0, i0)
        _, _, t_best, i_best = lax.while_loop(cond, body, st0)
    t_ref[0] = t_best
    idx_ref[0] = i_best


def _rays_tiles(o, d, tmin, tmax):
    """Pack a ray batch into [n_tiles, 8, TILE_S, TILE_L] field tiles; dead
    padding (tmin=+inf, tmax=-1) fails every slab/triangle test."""
    n = o.shape[0]
    pad = (-n) % TILE
    n_tiles = (n + pad) // TILE

    def pad1(x, fill):
        return jnp.pad(x, ((0, pad),), constant_values=fill)

    fields = jnp.stack([
        pad1(o[:, 0], 0.0), pad1(o[:, 1], 0.0), pad1(o[:, 2], 0.0),
        pad1(d[:, 0], 1.0), pad1(d[:, 1], 0.0), pad1(d[:, 2], 0.0),
        pad1(tmin, jnp.inf), pad1(tmax, -1.0),
    ])
    return fields.reshape(8, n_tiles, TILE_S, TILE_L).swapaxes(0, 1)


def intersect_wide(meta_tbl, bounds_pl, tris_pl, inst_flat, n_tris,
                   o, d, tmin, tmax, *, leaf_size: int, blas_root: int = 0,
                   has_inst: bool = False, any_hit: bool = False,
                   interpret: bool = False, with_stats: bool = False):
    """Distance-ordered 8-wide packet traversal (closest or any hit).

    meta_tbl [Nm*8] i32 flat (SMEM), bounds_pl [48,Np] f32, tris_pl [9,Tp]
    f32, inst_flat [(I+1)*4] f32 (identity row + per-instance off.xyz,
    scale; SMEM). Hit indices are encoded instance * n_tris + triangle
    (instance 0 when has_inst=False), matching ops/bvh.py
    intersect_instances. with_stats=True additionally returns per-tile
    (internal pops, leaf pops) counters [n_tiles, 2] for traversal tuning."""
    n = o.shape[0]
    rays = _rays_tiles(o, d, tmin, tmax)
    n_tiles = rays.shape[0]

    kernel = functools.partial(
        _wide_kernel, n_tris=n_tris, leaf_size=leaf_size,
        blas_root=blas_root, has_inst=has_inst, occlusion=any_hit,
        with_stats=with_stats,
    )
    nm, bp = meta_tbl.shape[0], bounds_pl.shape[1]
    tp, ip = tris_pl.shape[1], inst_flat.shape[0]
    out_specs = [
        pl.BlockSpec((1, TILE_S, TILE_L), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_S, TILE_L), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_S, TILE_L), jnp.int32),
    ]
    if with_stats:
        # full-array SMEM accumulator (blocked SMEM outputs are rejected by
        # the lowering); each grid step writes its own row
        out_specs.append(pl.BlockSpec((n_tiles, 2), lambda i: (0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((n_tiles, 2), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((nm,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((6 * WIDTH, bp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ip,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, TILE_S, TILE_L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK_CAP + WIDTH,), jnp.int32),
            pltpu.SMEM((STACK_CAP + WIDTH,), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta_tbl, bounds_pl, tris_pl, inst_flat, rays)

    t = outs[0].reshape(-1)[:n]
    idx = outs[1].reshape(-1)[:n]
    hit = KindHit(t=t, index=idx, valid=jnp.isfinite(t))
    if with_stats:
        return hit, outs[2]
    return hit
