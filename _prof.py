import sys, time, functools, numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Np = 137088
rng = np.random.default_rng(0)
tab = rng.random((8, Np)).astype(np.float32)
tab[6,:] = np.minimum(np.arange(Np)+1, Np).astype(np.float32)
tab[7,:] = -1.0
table = jnp.asarray(tab)
K = 2000

def fetch_mxu(table_ref, row_idx):
    blk = pl.multiple_of((row_idx // 128) * 128, 128)
    cols = table_ref[:, pl.ds(blk, 128)]
    lane = row_idx % 128
    onehot = (lax.broadcasted_iota(jnp.int32, (128,128), 0) == lane).astype(jnp.float32)
    return jnp.dot(cols, onehot, preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)

def fetch_reduce(table_ref, row_idx):
    blk = pl.multiple_of((row_idx // 128) * 128, 128)
    cols = table_ref[:, pl.ds(blk, 128)]
    lane = row_idx % 128
    sel = lax.broadcasted_iota(jnp.int32, (8,128), 1) == lane
    m = jnp.max(jnp.where(sel, cols, -jnp.inf), axis=1, keepdims=True)  # [8,1]
    return jnp.broadcast_to(m, (8,128))

def mk(mode):
    dep = mode.endswith("dep")
    fetch = fetch_mxu if mode.startswith("mxu") else fetch_reduce
    def kernel(t_ref, o_ref):
        ox = jnp.zeros((8,128), jnp.float32)
        def body(i, s):
            node, acc = s
            nb = fetch(t_ref, node if dep else i % Np)
            t0 = (nb[0:1,:] - ox) * 1.7
            t1 = (nb[3:4,:] - ox) * 1.7
            acc = acc + jnp.minimum(t0, t1)
            nxt = jnp.max(nb[6:7,:]).astype(jnp.int32) if dep else node
            return (nxt, acc)
        _, acc = lax.fori_loop(0, K, body, (jnp.int32(0), jnp.zeros((8,128), jnp.float32)))
        o_ref[:] = acc
    return kernel

for mode in ("mxu_dep", "mxu_indep", "red_dep", "red_indep"):
    f = pl.pallas_call(mk(mode), out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        in_specs=[pl.BlockSpec(table.shape, lambda: (0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8,128), lambda: (0,0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=30*1024*1024))
    g = jax.jit(lambda t: f(t))
    r = g(table); jax.block_until_ready(r)
    t0=time.perf_counter(); reps=5
    for _ in range(reps): r = g(table)
    jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/reps
    print(mode, "ns/step:", round(dt/K*1e9, 1), flush=True)
