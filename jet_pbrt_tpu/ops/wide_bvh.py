"""8-wide BVH: host-side collapse + distance-ordered Pallas packet traversal.

TPU-native successor of the reference's recursive 2-wide CPU walk
(reference: src/bvh.h:94-146). A whole ray tile (8x128 = 1024 rays — one VPU
register of rays) advances in lockstep behind a shared SMEM traversal stack;
every iteration pops one 8-wide node, slab-tests all 8 children against the
tile, orders the hit children near-to-far by packet-nearest entry distance,
and pushes them so the near subtree tightens the packet's best-hit bound
before the far subtree is visited (stale far entries are skipped on pop).

v2 kernel (round 3) — the round-2 kernel measured ~0.7us per pop, dominated
by per-pop *fixed* cost (8 serialized vector->scalar min-reductions feeding a
scalar sorting network, plus 16 serial triangle fetch+test chains per leaf).
The redesign keeps the traversal strategy but restructures every pop around
the TPU's strengths:

  * leaf-major triangle table [9*leaf_size, n_leaves]: ONE one-hot MXU
    contraction fetches a whole leaf, and the leaf_size Moller-Trumbore
    tests become independent vector ops (VLIW-packable) reduced by a
    min-tree instead of a serial update chain;
  * child ordering in the *int domain*: each child's packet-nearest entry
    distance is bitcast to int32 (order-preserving for non-negative floats)
    with the child slot packed into the low 3 bits, lane-reduced per child,
    and the 8 packed keys are sorted by a 19-comparator Batcher network of
    scalar int min/max pairs — no float scalars, no serialized reductions;
  * node bounds are stored as *conservative bf16* (min rounded down, max
    up): the node fetch becomes a single-pass bf16 MXU contraction (exact
    for 0/1 weights) at half the VMEM footprint; the slightly padded boxes
    only cost ~1% extra descents;
  * child push bookkeeping is precomputed at build time: the SMEM meta
    table stores ready-to-push stack-entry templates (instance-override in
    bits 26+, entry code below), so a push is two scalar loads and a few
    int ops;
  * the packet's best-hit bound and the per-entry stack distances live as
    bitcast int32 scalars — pop-side staleness is one int compare.

Two-level scenes (TLAS over instances + one shared BLAS) run in the same
kernel: TLAS nodes sit at the front of the table, their leaf children push
(BLAS root, instance id) entries, and each pop re-derives the instance-space
ray from a tiny SMEM instance table (uniform scale + translation); t/idx
bookkeeping stays in world units.

Traversal-order coherence is the other half of the story: incoherent bounce
waves saturate the tile union (measured 1257 pops/tile on the 66k-tri bunny
BLAS vs 404 after (direction-octant, origin-Morton) sorting — ops/sort.py),
so renderers enable sort_rays for BVH scenes.
"""
from __future__ import annotations

import functools

import numpy as np
import ml_dtypes
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import KindHit

WIDTH = 8
# collapse-time child encoding (int32): 0 = empty; 1..INST_BASE-1 = internal
# child (index m-1); >= INST_BASE = instance leaf (inst = m - INST_BASE);
# < 0 = triangle leaf (v = -m-1; leaf = v>>5; count = v & 31)
INST_BASE = 1 << 24
# stack-entry encoding (int32): (inst+1) << 26 | code;
# code < LEAF_BIT = internal node index, code >= LEAF_BIT = leaf (code-LEAF_BIT
# is the tri-leaf v). inst = -1 means world space (TLAS / non-instanced).
LEAF_BIT = 1 << 25
ENTRY_MASK = (1 << 26) - 1
# meta template (int32): (inst_override+1) << 26 | entry code; -1 = empty.
# A push resolves the instance as (override or inherited) and ORs the code.
STACK_CAP = 192   # build-time depth assert reference; see _wide_kernel layout
# v3 kernel stack layout (single SMEM array pair):
#   [0, NODE_CAP)              internal-node entries, grows up
#   [NODE_CAP, LEAF_BASE)      dump slots for masked pushes (>= KI*WIDTH)
#   [LEAF_BASE, STACK_TOTAL)   leaf entries, grows up
NODE_CAP = 768
DUMP_CAP = 64
LEAF_BASE = NODE_CAP + DUMP_CAP
LEAF_CAP = 1088
STACK_TOTAL = LEAF_BASE + LEAF_CAP
FAR = np.float32(3.0e37)
FAR_BITS = int(np.float32(FAR).view(np.int32))
# any packed child key (t-bits & ~7 | slot) of a missed child is >= this
FAR_KEY_MIN = FAR_BITS & ~7

# ray tile: 8 sublanes x 128 lanes (one VPU register of rays)
TILE_S, TILE_L = 8, 128
TILE = TILE_S * TILE_L

_VMEM_BUDGET = 13 * 1024 * 1024
_SMEM_BUDGET = 256 * 1024

# Batcher odd-even merge sort network for 8 elements (19 comparators)
_SORT8 = [(0, 1), (2, 3), (4, 5), (6, 7),
          (0, 2), (1, 3), (4, 6), (5, 7),
          (1, 2), (5, 6), (0, 4), (3, 7),
          (1, 5), (2, 6),
          (1, 4), (3, 6),
          (2, 4), (3, 5),
          (3, 4)]


def fits_vmem(n_wide_nodes: int, n_tris: int, leaf_size: int = 16) -> bool:
    """Gate: bf16 planar bounds + leaf-major f32 tris in VMEM, flat meta
    table in SMEM (SMEM is ~1MB/core and pads the trailing dim of 2-D
    arrays to 128 lanes, so the meta table is stored 1-D)."""
    pad = lambda x: ((max(x, 1) + 127) // 128) * 128
    n_leaves = (n_tris + leaf_size - 1) // leaf_size
    vmem = (pad(n_wide_nodes) * (6 * WIDTH) * 2
            + pad(n_leaves) * 9 * leaf_size * 4)
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
    leaf encoding. Returns (bounds [N8, WIDTH, 6] f32, meta [N8, WIDTH] i32
    in the raw collapse encoding — see module constants). Empty child slots
    get inverted boxes (min=+FAR, max=-FAR) so they fail every slab test in
    the vector domain with no scalar bookkeeping. Child order within a node
    is arbitrary — the kernel distance-orders at runtime."""
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
    empty_box = np.array([FAR, FAR, FAR, -FAR, -FAR, -FAR], np.float32)
    bounds_rows: list[np.ndarray] = []
    meta_rows: list[np.ndarray] = []
    depth_of: list[int] = []

    def new_node(depth: int) -> int:
        bounds_rows.append(np.tile(empty_box, (WIDTH, 1)))
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
    # stack-safety: each live pop pushes <= WIDTH-1 net node entries per
    # level; the v3 kernel pops up to 8 entries per iteration, so budget
    # 8x the single-pop bound plus the dump region
    max_depth = max(depth_of)
    assert (WIDTH - 1) * max_depth * 8 + DUMP_CAP <= NODE_CAP, (
        f"wide-BVH depth {max_depth} can overflow the {NODE_CAP}-entry "
        "node stack; rebuild with a larger leaf or raise NODE_CAP"
    )
    return np.stack(bounds_rows), np.stack(meta_rows)


def _bf16_pad(a: np.ndarray, up: bool) -> np.ndarray:
    """Conservative bf16: pad by one bf16 ulp's worth of relative slack in
    the wanted direction, then round-to-nearest — the result provably
    brackets a (pad 2^-7 rel >= 2x the 2^-8 rel RTN error)."""
    a = np.asarray(a, np.float32)
    pad = np.abs(a) * np.float32(2.0 ** -7) + np.float32(1e-30)
    v = a + pad if up else a - pad
    return v.astype(ml_dtypes.bfloat16)


def _planar_bounds(bounds: np.ndarray) -> np.ndarray:
    """[N8, WIDTH, 6] f32 -> lane-padded planar conservative-bf16
    [6*WIDTH, Np] (node axis in lanes). Row 6k+a = child k's
    (lo.xyz, hi.xyz)[a]."""
    n8 = bounds.shape[0]
    lo = _bf16_pad(bounds[:, :, :3], up=False)
    hi = _bf16_pad(bounds[:, :, 3:], up=True)
    a = np.concatenate([lo, hi], axis=2)          # [n8, WIDTH, 6]
    out = np.ascontiguousarray(a.reshape(n8, WIDTH * 6).T)  # [48, n8]
    padc = (-n8) % 128
    return np.pad(out, ((0, 0), (0, padc)))


def _templates(meta: np.ndarray, blas_root: int) -> np.ndarray:
    """Raw collapse meta [N8, WIDTH] -> flat push templates [N8*WIDTH] i32:
    (inst_override+1) << 26 | entry code; -1 for empty slots. 1-D because
    SMEM pads 2-D trailing dims to 128 lanes (16x waste)."""
    m = meta.astype(np.int64)
    is_int = (m > 0) & (m < INST_BASE)
    is_ins = m >= INST_BASE
    is_tri = m < 0
    ecode = np.where(is_int, m - 1,
                     np.where(is_ins, blas_root, (LEAF_BIT + (-m - 1))))
    ov = np.where(is_ins, m - INST_BASE + 1, 0)
    assert ov.max(initial=0) < 32, "instance override field is 5 bits"
    tmpl = np.where(m == 0, -1, (ov << 26) | ecode)
    return np.ascontiguousarray(tmpl.reshape(-1).astype(np.int32))


def _leaf_major_tris(tris: np.ndarray, leaf_size: int) -> np.ndarray:
    """[T,9] Moller-Trumbore rows (p0, e1, e2) -> leaf-major planar
    [9*leaf_size, n_leaves_padded]: lane = leaf, sublane-row slot*9+f. One
    one-hot contraction fetches a whole leaf. Padding tris are all-zero
    (det = 0 -> never hit)."""
    a = np.asarray(tris, np.float32)
    t = a.shape[0]
    n_leaves = max((t + leaf_size - 1) // leaf_size, 1)
    a = np.pad(a, ((0, n_leaves * leaf_size - t), (0, 0)))
    a = a.reshape(n_leaves, leaf_size * 9).T
    padc = (-n_leaves) % 128
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
    """Single-level tables: (bounds_pl bf16 [48,Np], templates flat i32,
    tris leaf-major f32 [9*leaf,Lp], inst flat [4] identity, n_wide,
    blas_root=0)."""
    bounds, meta = collapse_wide(bvh, leaf_size)
    return (_planar_bounds(bounds), _templates(meta, 0),
            _leaf_major_tris(tris, leaf_size),
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
    return (_planar_bounds(bounds), _templates(meta, n_tlas),
            _leaf_major_tris(tris, leaf_size), _flat_inst(inst_off, inst_scale),
            bounds.shape[0], n_tlas)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _wide_kernel(meta_ref, bounds_ref, tris_ref, inst_ref, rays_ref,
                 t_ref, idx_ref, *refs,
                 n_tris, leaf_size, blas_root, has_inst, occlusion,
                 with_stats=False, n_int_pop=4, n_leaf_pop=4,
                 interpret_mode=False):
    """One ray tile [TILE_S, TILE_L] walks the wide BVH behind segregated
    SMEM node/leaf stacks, retiring n_int_pop internal expansions AND
    n_leaf_pop leaf tests per iteration. rays_ref fields: ox oy oz dx dy dz
    tmin tmax.

    v3 (round 4): the r3 single-pop kernel measured ~630ns/pop, of which
    ~87ns loop overhead, ~160ns node-fetch latency, ~290ns lane-reduce +
    vector->scalar extract latency, ~85ns sort/push — all LATENCY, not
    compute (the 8 slab tests cost 10ns: VPU work is essentially free
    here). The fix is ILP: pop K independent entries per iteration so
    their fetch/reduce/extract chains overlap, and segregate internal vs
    leaf entries into two stacks so the loop body is straight-line code
    with no lax.cond divergence. Node children push to the node stack,
    leaf children to the leaf stack (single SMEM array pair, see layout
    constants); masked/dead pushes land in dump slots. The internal stream
    stalls (repops same entries next iteration) if the leaf stack could
    overflow. Correctness never depends on pop order: an entry is dropped
    only when its packet-entry distance exceeds the packet's bitcast
    best-hit bound (recomputed once per iteration from min(tmax, t_best)).
    """
    if with_stats:
        stats_ref, stack_ref, tstack_ref = refs
    else:
        stack_ref, tstack_ref = refs

    # dead-tile early exit: one row load + reduce decides whether the
    # preamble (8 ray-field loads, 3 guarded divides, iota, stack seeds)
    # runs at all — shadow batches at deep bounces are >95% dead tiles
    tmax0 = rays_ref[0, 7]
    bound00 = lax.bitcast_convert_type(tmax0, jnp.int32)
    any_live = jnp.max(bound00) > 0
    t_ref[0] = jnp.full((TILE_S, TILE_L), jnp.inf, jnp.float32)
    idx_ref[0] = jnp.zeros((TILE_S, TILE_L), jnp.int32)
    if with_stats:
        tile = pl.program_id(0)
        stats_ref[tile, 0] = jnp.int32(0)
        stats_ref[tile, 1] = jnp.int32(0)

    @pl.when(any_live)
    def _live():
        _wide_tile(meta_ref, bounds_ref, tris_ref, inst_ref, rays_ref,
                   t_ref, idx_ref, refs, n_tris=n_tris,
                   leaf_size=leaf_size, blas_root=blas_root,
                   has_inst=has_inst, occlusion=occlusion,
                   with_stats=with_stats, n_int_pop=n_int_pop,
                   n_leaf_pop=n_leaf_pop, interpret_mode=interpret_mode)


def _wide_tile(meta_ref, bounds_ref, tris_ref, inst_ref, rays_ref,
               t_ref, idx_ref, refs,
               *, n_tris, leaf_size, blas_root, has_inst, occlusion,
               with_stats, n_int_pop, n_leaf_pop, interpret_mode):
    """Traversal body for one LIVE ray tile (see _wide_kernel)."""
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
        """Replicated-column one-hot contraction: returns the row_idx'th
        lane of the planar table broadcast across all 128 lanes. bf16
        tables take the single-pass MXU path (exact for 0/1 weights); f32
        tables use HIGHEST (exact; Precision.HIGH is both inexact for
        one-hot fetches — measured, scripts/fetch_precision_check.py —
        and unsupported by the Mosaic dot lowering)."""
        blk = pl.multiple_of((row_idx // 128) * 128, 128)
        cols = table_ref[:, pl.ds(blk, 128)]
        if cols.dtype == jnp.bfloat16:
            onehot = (iota_lane == row_idx % 128).astype(jnp.bfloat16)
            return jnp.dot(cols, onehot, preferred_element_type=jnp.float32)
        onehot = (iota_lane == row_idx % 128).astype(jnp.float32)
        return jnp.dot(cols, onehot, preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)

    def bits(x):
        return lax.bitcast_convert_type(x, jnp.int32)

    def inst_xform(inst):
        """Instance transform scalars (identity row at index 0)."""
        if has_inst:
            ofx = inst_ref[(inst + 1) * 4 + 0]
            ofy = inst_ref[(inst + 1) * 4 + 1]
            ofz = inst_ref[(inst + 1) * 4 + 2]
            scl = inst_ref[(inst + 1) * 4 + 3]
            inv = 1.0 / scl
            return ((ox - ofx) * inv, (oy - ofy) * inv, (oz - ofz) * inv,
                    tmin * inv, scl, inv)
        one = jnp.float32(1.0)
        return ox, oy, oz, tmin, one, one

    # root entry: node 0, world space (inst = -1 -> tag 0)
    stack_ref[0] = jnp.int32(0)
    tstack_ref[0] = jnp.int32(0)
    # masked leaf pops with an empty leaf stack read slot 0: seed it with a
    # harmless empty leaf (leaf 0, count 0) so the fetch index is in range
    stack_ref[LEAF_BASE] = jnp.int32((1 << 26) | LEAF_BIT)
    tstack_ref[LEAF_BASE] = jnp.int32(0)

    def body(carry):
        if with_stats:
            nsp, lsp, bound, t_best, i_best, n_int, n_leaf = carry
        else:
            nsp, lsp, bound, t_best, i_best = carry
            n_int = n_leaf = jnp.int32(0)

        cap0 = jnp.minimum(tmax, t_best)

        # ---- leaf pops: READ the entries first ---------------------------
        # this iteration's pushes reuse the popped region (the stack stays
        # contiguous: pushes start at lsp_base), so the loads must be issued
        # before any push store in program order
        lsp_base = jnp.maximum(lsp - n_leaf_pop, 0)
        leaf_pops = []
        for j in range(n_leaf_pop):
            idx = lsp - 1 - j
            okp = idx >= 0
            at = LEAF_BASE + jnp.maximum(idx, 0)
            leaf_pops.append((okp, stack_ref[at], tstack_ref[at]))

        # ---- internal stream: expand up to n_int_pop nodes ---------------
        # stall if the worst-case leaf pushes could overflow the leaf stack
        leaf_room = lsp < jnp.int32(LEAF_CAP - n_int_pop * WIDTH)
        pops = []
        for j in range(n_int_pop):
            idx = nsp - 1 - j
            okp = (idx >= 0) & leaf_room
            at = jnp.maximum(idx, 0)
            entry = stack_ref[at]
            te = tstack_ref[at]
            live = okp & (te < bound)
            inst = (entry >> 26) - 1
            code = entry & ENTRY_MASK
            oxl, oyl, ozl, tminl, scl, inv = inst_xform(inst)
            capl = cap0 * inv
            nb = fetch(bounds_ref, code)                 # [48,128] f32
            mins = []
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
                # clamp-form interval test: lo <= hi <=> the three original
                # conditions up to boundary-equal cases, which this form
                # ACCEPTS — conservative over-visits only (tminl > 0 also
                # makes lo the non-negative entry distance directly)
                lo = jnp.maximum(t_en, tminl)
                hi = jnp.minimum(t_ex, capl)
                hit = lo <= hi
                # packed child key: WORLD-unit entry distance bitcast to
                # int (order-preserving, both non-negative) | child slot
                x = jnp.where(hit, lo * scl, FAR)
                xk = (bits(x) & ~7) | k
                # reduce ray-sublanes first: (8,128) -> (1,128)
                mins.append(jnp.min(xk, axis=0, keepdims=True))
            # children on sublanes -> ONE lane reduce for all 8: (8,1)
            kmat = jnp.concatenate(mins, axis=0)
            kcol = jnp.min(kmat, axis=1, keepdims=True)
            pops.append((live, inst, code, kcol))
            if with_stats:
                n_int = n_int + live.astype(jnp.int32)

        off_n = jnp.int32(0)
        off_l = jnp.int32(0)
        nsp_base = jnp.maximum(nsp - n_int_pop, 0)
        nsp_base = jnp.where(leaf_room, nsp_base, nsp)
        for j, (live, inst, code, kcol) in enumerate(pops):
            kv = [kcol[k, 0] for k in range(WIDTH)]
            if not occlusion:
                # near-to-far order (pointless for any-hit, where the first
                # hit ends the lane)
                for a, b in _SORT8:
                    lo = jnp.minimum(kv[a], kv[b])
                    hi = jnp.maximum(kv[a], kv[b])
                    kv[a], kv[b] = lo, hi
            # branchless pushes far-to-near; missed children (FAR keys),
            # masked pops, and empty slots (tmpl -1, whose inverted FAR
            # boxes can pass the min/max slab form) go to dump slots
            for c, k in enumerate(range(WIDTH - 1, -1, -1)):
                kk = kv[k]
                slot = kk & 7
                tmpl = meta_ref[code * WIDTH + slot]
                ok = (kk < FAR_KEY_MIN) & (tmpl != -1) & live
                ov = tmpl >> 26
                ins = jnp.where(ov > 0, ov, inst + 1)
                ecode = tmpl & ENTRY_MASK
                to_leaf = ecode >= LEAF_BIT
                e = (ins << 26) | ecode
                addr = jnp.where(
                    ok,
                    jnp.where(to_leaf, LEAF_BASE + lsp_base + off_l,
                              nsp_base + off_n),
                    jnp.int32(NODE_CAP + j * WIDTH + c),
                )
                stack_ref[addr] = e
                tstack_ref[addr] = kk & ~7
                okn = ok & ~to_leaf
                okl = ok & to_leaf
                off_n = off_n + okn.astype(jnp.int32)
                off_l = off_l + okl.astype(jnp.int32)
        nsp_new = nsp_base + off_n

        # ---- leaf stream: test up to n_leaf_pop leaves -------------------
        # entries were read before the push stores; newly pushed leaves are
        # popped next iteration (LIFO keeps near leaves first). Every leaf
        # is tested against the ITERATION-START cap (cap0) and the results
        # are merged afterwards: chaining each leaf's cap through the
        # previous leaf's min-tree would serialize the K fetch+MT chains and
        # forfeit the whole ILP win (measured: ~2us/iter at K=4 chained vs
        # ~0.6us independent)
        results = []
        for j in range(n_leaf_pop):
            okp, entry, te = leaf_pops[j]
            live = okp & (te < bound)
            inst = (entry >> 26) - 1
            v = (entry & ENTRY_MASK) - LEAF_BIT
            leaf_idx = jnp.clip(v >> 5, 0, tris_ref.shape[1] - 1)
            oxl, oyl, ozl, tminl, scl, inv = inst_xform(inst)
            cap = cap0
            tr = fetch(tris_ref, leaf_idx)          # [9*leaf_size,128]
            tws = []
            for k in range(leaf_size):
                r = 9 * k
                e2x = row1(tr, r + 6)
                e2y = row1(tr, r + 7)
                e2z = row1(tr, r + 8)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                e1x = row1(tr, r + 3)
                e1y = row1(tr, r + 4)
                e1z = row1(tr, r + 5)
                det = e1x * px + e1y * py + e1z * pz
                if interpret_mode:
                    rcp = 1.0 / det
                else:
                    # approx reciprocal + one Newton step (~1 ulp): the VPU
                    # divide is the most expensive op in the 16-wide MT chain
                    rcp = pl.reciprocal(det, approx=True)
                    rcp = rcp * (2.0 - det * rcp)
                inv_det = jnp.where(jnp.abs(det) > 1e-12, rcp, 0.0)
                tx = oxl - row1(tr, r + 0)
                ty = oyl - row1(tr, r + 1)
                tz = ozl - row1(tr, r + 2)
                uu = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                t_w = tt * scl if has_inst else tt
                # the world-distance upper bound (cap = min(tmax, best))
                # must be part of the per-triangle accept even in occlusion
                # mode: shadow rays carry a finite tmax (light distance) and
                # must NOT be occluded by geometry beyond it (ADVICE r3 high).
                # Three former terms are provably redundant and dropped
                # (~12% of the leaf VPU chain):
                #  * (k < count): leaf tables are padded either by
                #    duplicating real triangles (idempotent for closest hit
                #    and occlusion; the duplicate row carries identical
                #    shading data) or with zero rows (det=0 -> rejected
                #    below);
                #  * |det| > eps: inv_det is already zeroed there, making
                #    tt = 0, which fails tt > tminl (tmin is always > 0);
                #  * min-form barycentric test replaces 3 cmps + 2 ands.
                ok = (
                    live
                    & (jnp.minimum(jnp.minimum(uu, vv), 1.0 - uu - vv)
                       >= 0.0)
                    & (tt > tminl)
                    & (t_w < cap)
                )
                if occlusion:
                    # any-hit needs no distance or index — one OR per tri
                    # replaces the select + min-tree + slot-select epilogue
                    tws.append(ok)
                else:
                    tws.append(jnp.where(ok, t_w, jnp.inf))
            if occlusion:
                ok_any = tws[0]
                for k in range(1, leaf_size):
                    ok_any = ok_any | tws[k]
                results.append((ok_any, None))
            else:
                # min-tree over the independent per-slot hits (no serial
                # chain)
                t_min = tws[0]
                for k in range(1, leaf_size):
                    t_min = jnp.minimum(t_min, tws[k])
                slot = jnp.full_like(i_best, leaf_size)
                for k in range(leaf_size - 1, -1, -1):
                    slot = jnp.where(tws[k] == t_min, k, slot)
                iw = (jnp.maximum(inst, 0) * n_tris
                      + leaf_idx * leaf_size + slot)
                results.append((t_min, iw))
            if with_stats:
                n_leaf = n_leaf + live.astype(jnp.int32)
        # merge the independent leaf results (short select chain)
        tb = t_best
        ib = i_best
        for t_min, iw in results:
            if occlusion:
                tb = jnp.where(t_min, jnp.float32(0.0), tb)
            else:
                better = t_min < tb
                tb = jnp.where(better, t_min, tb)
                ib = jnp.where(better, iw, ib)
        lsp_new = lsp_base + off_l

        # packet bound: bitcast max of min(tmax, best) over the tile; dead
        # lanes (tmax -1) go negative and drop out unless the whole tile is
        # dead, in which case the loop drains without popping
        bound_new = jnp.max(bits(jnp.minimum(tmax, tb)))
        if with_stats:
            return (nsp_new, lsp_new, bound_new, tb, ib, n_int, n_leaf)
        return (nsp_new, lsp_new, bound_new, tb, ib)

    def cond(carry):
        return ((carry[0] > 0) | (carry[1] > 0)) & (carry[2] > 0)

    t0 = jnp.full((TILE_S, TILE_L), jnp.inf, jnp.float32)
    i0 = jnp.zeros((TILE_S, TILE_L), jnp.int32)
    bound0 = jnp.max(lax.bitcast_convert_type(tmax, jnp.int32))
    if with_stats:
        st0 = (jnp.int32(1), jnp.int32(0), bound0, t0, i0,
               jnp.int32(0), jnp.int32(0))
        out = lax.while_loop(cond, body, st0)
        _, _, _, t_best, i_best, n_int, n_leaf = out
        tile = pl.program_id(0)
        stats_ref[tile, 0] = n_int
        stats_ref[tile, 1] = n_leaf
    else:
        st0 = (jnp.int32(1), jnp.int32(0), bound0, t0, i0)
        _, _, _, t_best, i_best = lax.while_loop(cond, body, st0)
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
                   interpret: bool = False, with_stats: bool = False,
                   n_int_pop: int = 2, n_leaf_pop: int = 4):
    """Distance-ordered 8-wide packet traversal (closest or any hit).

    meta_tbl [Nm*8] i32 flat push templates (SMEM), bounds_pl [48,Np] bf16,
    tris_pl [9*leaf_size,Lp] f32 leaf-major, inst_flat [(I+1)*4] f32
    (identity row + per-instance off.xyz, scale; SMEM). Hit indices are
    encoded instance * n_tris + triangle (instance 0 when has_inst=False),
    matching ops/bvh.py intersect_instances. with_stats=True additionally
    returns per-tile (internal pops, leaf pops) counters [n_tiles, 2] for
    traversal tuning."""
    n = o.shape[0]
    rays = _rays_tiles(o, d, tmin, tmax)
    n_tiles = rays.shape[0]

    kernel = functools.partial(
        _wide_kernel, n_tris=n_tris, leaf_size=leaf_size,
        blas_root=blas_root, has_inst=has_inst, occlusion=any_hit,
        with_stats=with_stats, n_int_pop=n_int_pop, n_leaf_pop=n_leaf_pop,
        interpret_mode=interpret,
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
            pl.BlockSpec((9 * leaf_size, tp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ip,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, TILE_S, TILE_L), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK_TOTAL,), jnp.int32),
            pltpu.SMEM((STACK_TOTAL,), jnp.int32),
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
