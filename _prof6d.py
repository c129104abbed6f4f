import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
rows = 2000000
tab = jnp.asarray(np.random.rand(rows, 8).astype(np.float32))
for n in (65536,):
    idx0 = jnp.asarray(np.random.randint(0, rows, n).astype(np.int32))
    K = 500
    def run(tab, idx):
        def body(s):
            i, idx, acc = s
            row = tab[idx]                      # [n,8] gather
            acc = acc + row[:,0]
            idx = (idx + 1 + (row[:,1]*1000).astype(jnp.int32)) % rows
            return i+1, idx, acc
        def cond(s): return s[0] < K
        _, _, acc = lax.while_loop(cond, body, (jnp.int32(0), idx, jnp.zeros((n,), jnp.float32)))
        return acc
    f = jax.jit(run)
    r = f(tab, idx0); jax.block_until_ready(r)
    t0=time.perf_counter(); reps=3
    for _ in range(reps): r = f(tab, idx0)
    jax.block_until_ready(r); dt=(time.perf_counter()-t0)/reps
    print(f"n={n}: {dt/K*1e6:.1f} us/step in while_loop", flush=True)
