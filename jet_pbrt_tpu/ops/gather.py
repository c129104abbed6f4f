"""Fast row lookup from small tables.

TPU has no fast hardware gather; XLA lowers `table[idx]` for [N]-sized index
vectors to a slow scatter/gather loop (~1ms per gather at N=262k on v5e —
measured to cost as much as a full 32-triangle scene traversal). For the
small tables a renderer actually gathers from per bounce — materials, light
radiance, per-kind shape attributes of small scenes — a one-hot matmul is
2-3x faster and runs on the MXU. This module routes lookups: one-hot
contraction when the table is small, plain gather otherwise (BVH-scale
tables).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# tables up to this many rows go through the one-hot matmul path
ONE_HOT_MAX_ROWS = 128


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table: [M, ...], idx: int[N] -> [N, ...]. Exact for int/bool tables
    (values pass through f32, exact below 2^24)."""
    m = table.shape[0]
    if m == 0 or m > ONE_HOT_MAX_ROWS or idx.ndim != 1:
        return table[idx]
    oh = jax.nn.one_hot(idx, m, dtype=jnp.float32)          # [N, M]
    flat = table.reshape(m, -1)
    if flat.dtype == jnp.bool_:
        out = oh @ flat.astype(jnp.float32)
        return (out > 0.5).reshape((idx.shape[0],) + table.shape[1:])
    if jnp.issubdtype(flat.dtype, jnp.integer):
        out = oh @ flat.astype(jnp.float32)
        return jnp.round(out).astype(table.dtype).reshape(
            (idx.shape[0],) + table.shape[1:]
        )
    out = oh @ flat.astype(jnp.float32)
    return out.astype(table.dtype).reshape((idx.shape[0],) + table.shape[1:])
